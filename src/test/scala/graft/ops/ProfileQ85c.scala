package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prototype A/B: q85Repeat via lag windows vs the self-join spelling. */
object ProfileQ85c {
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

    def repLag(uw: DataFrame): DataFrame = {
      val wEt = Window.partitionBy(col("user_id"), col("scale"), col("event_type"))
        .orderBy(col("bucket"))
      val wUs = Window.partitionBy(col("user_id"), col("scale"))
        .orderBy(col("bucket"))
      uw.withColumn("pb", lag(col("bucket"), 1).over(wEt))
        .groupBy(col("user_id"), col("scale"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("pb") === col("bucket") - 1, 1L).otherwise(0L)).as("i"))
        .withColumn("pn",
          when(lag(col("bucket"), 1).over(wUs) === col("bucket") - 1,
            lag(col("n"), 1).over(wUs)))
        .select(col("user_id"), col("scale"), col("bucket"),
          Exact.r(col("i") /
            (col("n") + coalesce(col("pn"), lit(0L)) - col("i")), 6).as("repeat_rate"))
    }

    def evBase = Features.q85EvBase(spark, dir)
    def uwOf = Features.q85Uw(evBase)
    val a = Features.q85Repeat(uwOf)
    val b = repLag(uwOf)
    println(s"[profile] exact-compare join-vs-lag: a-only=${a.exceptAll(b).count()}" +
      s" b-only=${b.exceptAll(a).count()} (a=${a.count()})")
    spark.catalog.clearCache()
    time("REP_join_warm")(mat(Features.q85Repeat(uwOf)))
    time("REP_lag_warm")(mat(repLag(uwOf)))
    time("REP_join")(mat(Features.q85Repeat(uwOf)))
    time("REP_lag")(mat(repLag(uwOf)))
    time("REP_join2")(mat(Features.q85Repeat(uwOf)))
    time("REP_lag2")(mat(repLag(uwOf)))
    spark.stop()
  }
}
