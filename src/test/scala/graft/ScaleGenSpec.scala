package graft

import org.apache.spark.sql.functions._

/** Pins the scale-replica contract the benches depend on:
  *  - fact outputs are MANY splittable files (the round-6 lesson: a
  *    single giant-row-group file caps any scan at one task no matter
  *    how many executors exist — SURVEY §5);
  *  - k× replication is exact per fact table, dimensions stay 1×;
  *  - replica key spaces are disjoint (every equi-join stays within
  *    its replica) and props.k shifts with the same stride, so the
  *    call graph becomes k disjoint cohorts, not a k-fold hub. */
class ScaleGenSpec extends SparkSpec {

  private val k = 3
  private lazy val out: String = {
    val dir = java.nio.file.Files.createTempDirectory("scalegen_spec")
      .toAbsolutePath.toString
    ScaleGen.run(spark, sf, dir, k)
    dir
  }

  private def partFiles(table: String): Int =
    new java.io.File(s"$out/$table.parquet").listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))

  test("fact tables fan out to multiple splittable files; dims stay single") {
    assert(partFiles("events") > 1, "events replica must be multi-file")
    assert(partFiles("documents") > 1, "documents replica must be multi-file")
    assert(partFiles("region") == 1)
  }

  test("each fact table replicates exactly kx; dimensions stay 1x") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings"))
      assert(Tables(spark, out, t).count() == k * Tables(spark, sf, t).count(), t)
    for (t <- Seq("region", "nation"))
      assert(Tables(spark, out, t).count() == Tables(spark, sf, t).count(), t)
  }

  test("replica key spaces are disjoint and props.k shifts with its user") {
    val src = Tables.events(spark, sf)
    val rep = Tables.events(spark, out)
    assert(rep.select(col("user_id")).distinct().count()
      == k * src.select(col("user_id")).distinct().count())
    // props.k must stay a within-replica peer: same 10^7 band as user_id
    val bands = rep.select(
        (col("user_id") / lit(10000000L)).cast("long").as("ub"),
        (get_json_object(col("props"), "$.k").cast("long") / lit(10000000L))
          .cast("long").as("kb"))
      .filter(col("kb").isNotNull)
    assert(bands.filter(col("ub") =!= col("kb")).count() == 0,
      "a replica's call edges must point at its own cohort")
  }

  test("replica events keep per-row timestamp precision readable") {
    val src = Tables.events(spark, sf).agg(max(col("ts"))).head().getTimestamp(0)
    val rep = Tables.events(spark, out).agg(max(col("ts"))).head().getTimestamp(0)
    assert(src == rep, "ts must survive the nanos-long round trip")
  }
}
