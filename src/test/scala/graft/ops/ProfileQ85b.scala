package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prototype A/B: keyed triangle/clustering core via adjacency-array
  * intersection vs the 3-way self-join. Exact-compare + timing only —
  * NOT production until proven equal and faster. */
object ProfileQ85b {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", sys.error("SPARK_GRAFT_SF_DIR unset"))
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    def mat(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time[T](name: String)(f: => T): T = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val keys = Seq("scale", "bucket")

    // array-intersect variant of q23FromUndKeyed
    def ccArr(und: DataFrame): DataFrame = {
      val canon = Graph.capPerKeys(und.filter(col("src") < col("dst")), keys :+ "src", "dst", Graph.adjCap)
      val adj = canon.groupBy((keys :+ "src").map(col): _*)
        .agg(collect_list(col("dst")).as("nbrs"))
      val edges = canon
        .join(adj.select(keys.map(col) :+ col("src") :+ col("nbrs").as("na"): _*),
          keys :+ "src")
        .join(adj.select(keys.map(col) :+ col("src").as("dst") :+ col("nbrs").as("nb"): _*),
          keys :+ "dst")
      val tris = edges.select(keys.map(col) :+ col("src").as("a") :+ col("dst").as("b") :+
          explode(array_intersect(col("na"), col("nb"))).as("c"): _*)
      val perNode = tris
        .select(keys.map(col) :+ explode(array(col("a"), col("b"), col("c"))).as("node"): _*)
        .groupBy((keys :+ "node").map(col): _*).agg(count(lit(1)).as("t"))
      und.groupBy(keys.map(col) :+ col("src").as("node"): _*)
        .agg(count(lit(1)).as("deg"))
        .join(perNode, keys :+ "node", "left")
        .select((keys :+ "node").map(col) :+ col("deg") :+
          coalesce(col("t"), lit(0L)).as("triangles") :+
          Exact.r(when(col("deg") >= 2,
              coalesce(col("t"), lit(0L)) * lit(2.0) / (col("deg") * (col("deg") - 1)))
            .otherwise(lit(0.0)), 6).as("clustering"): _*)
    }

    def evBase = Features.q85EvBase(spark, dir)
    def undOf = Graph.symmetrizedKeyed(Features.q85Edges(evBase), keys)
      .distinct().filter(col("src") =!= col("dst"))

    val a = Graph.q23FromUndKeyed(undOf, keys)
    val b = ccArr(undOf)
    println(s"[profile] exact-compare join-vs-array: a-only=${a.exceptAll(b).count()}" +
      s" b-only=${b.exceptAll(a).count()}")
    spark.catalog.clearCache()
    time("CC_join_warm")(mat(Graph.q23FromUndKeyed(undOf, keys)))
    time("CC_array_warm")(mat(ccArr(undOf)))
    time("CC_join")(mat(Graph.q23FromUndKeyed(undOf, keys)))
    time("CC_array")(mat(ccArr(undOf)))
    time("CC_join2")(mat(Graph.q23FromUndKeyed(undOf, keys)))
    time("CC_array2")(mat(ccArr(undOf)))
    spark.stop()
  }
}
