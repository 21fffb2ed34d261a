package graft

import org.apache.spark.sql.functions._

/** saltedJoin correctness: same result as a plain join, spread tasks. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on a skewed key") {
    // left: one hot key (90% of rows) + tail
    val left = (1 to 2000).map(i => (if (i <= 1800) 1L else i.toLong, i))
      .toDF("k", "lv")
    val right = (1 to 300).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, "k").select("k", "lv", "rv")
    val salted = ops.Skew.saltedJoin(left, right, "k", salt = 8)
      .select("k", "lv", "rv")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin left_outer keeps unmatched rows exactly once") {
    val left = Seq((1L, "a"), (2L, "b"), (99L, "zz")).toDF("k", "lv")
    val right = Seq((1L, "x"), (2L, "y")).toDF("k", "rv")
    val out = ops.Skew.saltedJoin(left, right, "k", salt = 4, "left_outer")
    assert(out.count() == 3)
    assert(out.filter(col("rv").isNull).count() == 1)
  }

  test("keyHistogram surfaces the hot key first") {
    val df = (1 to 100).map(i => (if (i <= 60) 7L else i.toLong, i)).toDF("k", "v")
    val top = ops.Skew.keyHistogram(df, "k", 3).head()
    assert(top.getLong(0) == 7L && top.getLong(1) == 60L)
  }

  // -------------------------------------------------------------------
  // CI-sized skew gate (the sf1/sf10 sweep's invariants, shrunk to every
  // suite run): a hub-injected replica where the celebrity keys really
  // exceed the caps, with the capped outputs and candidate volumes
  // pinned. An edit that silently drops adjCap or the q31 df-cap goes
  // red HERE instead of surviving until the next 100x sweep. Golden
  // numbers were cross-derived in DuckDB on the same replica, and each
  // cap was mutation-tested once (adjCap -> MaxValue flips q21 to 96098
  // rows; q31MaxDf -> MaxValue flips the candidate count to 1,843,470).
  // -------------------------------------------------------------------

  /** 60x hub-injected replica of the smoke SF — sized so the celebrity
    * supplier's degree (~411) exceeds adjCap=256 and the hot-sentence
    * family's df (~1500) exceeds q31MaxDf=50; generated once, lazily,
    * and deleted in afterAll — without that, every suite run leaks a
    * ~17 MB replica into /tmp forever. */
  @volatile private var skewDirPath: Option[java.nio.file.Path] = None
  private lazy val skewDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("skew_gate")
    skewDirPath = Some(dir)
    ScaleGen.run(spark, sf, dir.toAbsolutePath.toString, 60, skew = true)
    dir.toAbsolutePath.toString
  }

  override def afterAll(): Unit = {
    try skewDirPath.foreach { d =>
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      val walk = Files.walk(d)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    } finally super.afterAll()
  }

  test("skew gate: hub exceeds adjCap and q21 returns the capped-subgraph result") {
    // non-vacuity: the hub's raw degree in q21's thresholded edge set
    // must exceed the cap, otherwise this gate tests nothing
    val hubDeg = Tables.orders(spark, skewDir)
      .join(Tables.lineitem(spark, skewDir), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_quantity") >= 45 &&
        col("l_suppkey") === ScaleGen.skewSupplier)
      .select(col("o_custkey")).distinct().count()
    assert(hubDeg > ops.Graph.adjCap,
      s"hub degree $hubDeg no longer exceeds adjCap=${ops.Graph.adjCap} — raise k")
    // golden CAPPED result; the uncapped subgraph yields 96098 pairs
    assert(SparkEntry.queries("q21_common_neighbors")(spark, skewDir).count() == 95994L)
  }

  test("skew gate: q21 DataFrame plan matches its oracle SQL run by Spark") {
    // the exact CTE text the DuckDB gate runs, executed by Spark's own
    // SQL path — an engine-internal dual-plan oracle on SKEWED data
    Tables.orders(spark, skewDir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, skewDir).createOrReplaceTempView("lineitem")
    try {
      val viaSql = spark.sql(s"WITH ${ops.Graph.lsnSql} SELECT u, v FROM lsn")
      val viaDf = SparkEntry.queries("q21_common_neighbors")(spark, skewDir)
        .select(col("u"), col("v"))
      assert(viaDf.exceptAll(viaSql).isEmpty, "DataFrame rows missing from SQL")
      assert(viaSql.exceptAll(viaDf).isEmpty, "SQL rows missing from DataFrame")
    } finally {
      spark.catalog.dropTempView("orders")
      spark.catalog.dropTempView("lineitem")
    }
  }

  test("skew gate: hot-shingle df exceeds q31MaxDf and candidate volume stays capped") {
    val hotDocs = Tables.documents(spark, skewDir)
      .filter(col("text").contains("hotdup0")).count()
    assert(hotDocs > ops.Text.q31MaxDf,
      s"hot-sentence family df $hotDocs no longer exceeds the cap — raise k")
    // golden CAPPED candidate-pair count; without the df-cap the hot
    // family alone pushes this to 1,843,470 (2.6x) and grows as df²
    val kept = ops.Text.q31KeptShingles(spark, skewDir)
    assert(ops.Text.q31InterFrom(kept).count() == 721860L)
  }
}
