package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Throwaway stage profiler for the iterative graph family (q73's
  * shape): times the edge build, the degree agg, one message round,
  * the localCheckpoint, and the full query, so the optimization budget
  * goes to the piece that actually costs. NOT a correctness artifact.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   sbt "Test/runMain graft.ops.ProfileQ73"
  */
object ProfileQ73 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      sys.error("SPARK_GRAFT_SF_DIR is unset"))
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")

    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[T](name: String)(f: => T): T = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // warmup pass (JIT/codegen)
    mat(Graph.q73PageRank(spark, dir))
    spark.catalog.clearCache()

    time("full_q73")(mat(Graph.q73PageRank(spark, dir)))
    spark.catalog.clearCache(); System.gc()

    // piecewise
    val und = time("und_build+cache") {
      val u = Graph.undFrom(Graph.factBase(spark, dir)
        .select(col("src"), col("dst"))).cache()
      mat(u); u
    }
    val adj = und.withColumn("w", lit(1L))
    val ws = time("ws_agg") {
      val w = adj.groupBy(col("src").as("n")).agg(sum(col("w")).as("ws"))
      mat(w); w
    }
    val wsS = broadcast(ws.select(col("n").as("src"), col("ws")))
    var rs = ws.select(col("n"), lit(1.0).as("rs"))
    for (i <- 1 to 3) {
      val prev = time(s"round${i}_checkpoint") {
        broadcast(rs.localCheckpoint(true)
          .select(col("n").as("src"), col("rs").as("prs")))
      }
      rs = adj.join(wsS, "src").join(prev, "src")
        .select(col("dst"),
          (col("prs") * col("w") / col("ws")).cast("decimal(28,12)").as("m"))
        .groupBy(col("dst").as("n"))
        .agg(Exact.r(lit(0.15) + lit(0.85) * sum(col("m")).cast("double"), 6)
          .as("rs"))
      time(s"round${i}_agg")(mat(rs))
    }
    val nn = ws.agg(count(lit(1)).as("nn"))
    time("final_join") {
      mat(rs.join(ws, "n").crossJoin(broadcast(nn))
        .select(col("n").as("node"), col("ws").as("wdeg"),
          col("rs").as("pr_scaled"),
          Exact.r(col("rs") / col("nn"), 9).as("pr"))
        .orderBy(col("node")))
    }
    spark.stop()
  }
}
/** Micro A/B of one message round's pieces. */
object ProfileQ73b {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", sys.error("SPARK_GRAFT_SF_DIR unset"))
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[T](name: String)(f: => T): T = {
      System.gc(); val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val und = Graph.undFrom(Graph.factBase(spark, dir)
      .select(col("src"), col("dst"))).cache()
    mat(und)
    println(s"[profile] und rows = ${und.count()}")
    val adj = und.withColumn("w", lit(1L))
    val ws = adj.groupBy(col("src").as("n")).agg(sum(col("w")).as("ws"))
    val wsS = broadcast(ws.select(col("n").as("src"), col("ws")))
    val prev = broadcast(ws.select(col("n").as("src"), lit(1.0).as("prs")))
    val joined = adj.join(wsS, "src").join(prev, "src")
      .select(col("dst"), (col("prs") * col("w") / col("ws")).as("md"))
    // warmups
    mat(joined); mat(und)
    time("cache_scan_only")(mat(und))
    time("join_project_double")(mat(joined))
    time("join_project_decimal")(mat(joined.select(col("dst"), col("md").cast("decimal(28,12)").as("m"))))
    time("agg_double")(mat(joined.groupBy(col("dst").as("n")).agg(sum(col("md")).as("s"))))
    time("agg_decimal28")(mat(joined.select(col("dst"), col("md").cast("decimal(28,12)").as("m"))
      .groupBy(col("dst").as("n")).agg(sum(col("m")).as("s"))))
    time("agg_decimal18")(mat(joined.select(col("dst"), col("md").cast("decimal(18,12)").as("m"))
      .groupBy(col("dst").as("n")).agg(sum(col("m")).as("s"))))
    time("agg_decimal28_rep")(mat(joined.select(col("dst"), col("md").cast("decimal(28,12)").as("m"))
      .groupBy(col("dst").as("n")).agg(sum(col("m")).as("s"))))
    spark.stop()
  }
}
