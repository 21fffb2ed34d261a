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

  test("--skew injects global hubs and a hot shingle family, same row counts") {
    val dir = java.nio.file.Files.createTempDirectory("scalegen_skew")
      .toAbsolutePath.toString
    ScaleGen.run(spark, sf, dir, k, skew = true)
    // row counts identical to the uniform replica — skew re-points
    // keys and appends text, it never adds or drops rows
    for (t <- Seq("lineitem", "events", "documents"))
      assert(Tables(spark, dir, t).count() == k * Tables(spark, sf, t).count(), t)
    // celebrity supplier: ONE global hub absorbing ~1% of all lineitem
    // rows across every replica (cross-replica by design)
    val li = Tables(spark, dir, "lineitem")
    val hubRows = li.filter(col("l_suppkey") === ScaleGen.skewSupplier).count()
    val total = li.count()
    assert(hubRows > total / 200 && hubRows < total / 20,
      s"supplier hub holds $hubRows of $total rows")
    val topSupp = li.groupBy(col("l_suppkey")).count()
      .orderBy(col("count").desc).head()
    assert(topSupp.getLong(0) == ScaleGen.skewSupplier,
      "the celebrity must be the top supplier key")
    // celebrity peer: same shape on events props.k
    val ev = Tables.events(spark, dir)
    val peerHub = ev.filter(
      get_json_object(col("props"), "$.k").cast("long") === ScaleGen.skewPeer).count()
    assert(peerHub > ev.count() / 200, s"peer hub holds $peerHub rows")
    // hot shingles: ~5% of docs end with the SAME byte run in every
    // replica (appended after suffixing), so its shingle df is global
    val docs = Tables.documents(spark, dir)
    val hot = docs.filter(col("text").endsWith(ScaleGen.skewHotSentence))
    assert(hot.count() == docs.count() / 20, "exactly doc_id%20==3 docs are hot")
    assert(hot.select((col("doc_id") % 20L).as("m")).distinct().count() == 1)
    // n_chars stays consistent with the appended text
    assert(docs.filter(length(col("text")) =!= col("n_chars")).count() == 0)
  }

  test("auto-stride lets replicas chain: replicating a replica picks a bigger stride") {
    val dir2 = java.nio.file.Files.createTempDirectory("scalegen_chain")
      .toAbsolutePath.toString
    ScaleGen.run(spark, out, dir2, 2) // `out` already holds keys ≥ 10^7
    val ev = Tables.events(spark, dir2)
    assert(ev.count() == 2L * k * Tables.events(spark, sf).count())
    // key spaces of the two second-level replicas stay disjoint: the
    // first-level ids (< k·10^7) and the shifted copies must not meet
    val users = ev.select(col("user_id")).distinct()
    assert(users.count() == 2L * k * Tables.events(spark, sf)
      .select(col("user_id")).distinct().count())
    // props.k still points within its (second-level) cohort
    val bands = ev.select(
        (col("user_id") / lit(100000000L)).cast("long").as("ub"),
        (get_json_object(col("props"), "$.k").cast("long") / lit(100000000L))
          .cast("long").as("kb"))
      .filter(col("kb").isNotNull)
    assert(bands.filter(col("ub") =!= col("kb")).count() == 0,
      "chained replica call edges must stay within their cohort")
  }
}
