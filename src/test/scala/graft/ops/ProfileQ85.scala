package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway component profiler for q85 — times each sub-DAG of
  * [[Features.q85Core]] in isolation (noop-materialized, cache dropped
  * between components) so optimization budget goes where the time is.
  * Mirrors the q85Core body; NOT a correctness artifact — conclusions
  * are re-verified against the real query before any change lands.
  *
  * Run: SPARK_GRAFT_SF_DIR=target/sf1 sbt "Test/runMain graft.ops.ProfileQ85"
  */
object ProfileQ85 {
  private val epoch = "2024-01-01"

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")

    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => DataFrame): Unit = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      mat(f)
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    def evBase = graft.Tables.events(spark, dir)
      .withColumn("day_idx", datediff(col("ts").cast("date"), lit(epoch).cast("date")))
      .withColumn("peer", get_json_object(col("props"), "$.k").cast("long"))
      .select(col("user_id"), col("ts"), col("event_type"), col("value"),
        col("day_idx"), col("peer"))

    def withScaleBucket(df: DataFrame): DataFrame = df
      .withColumn("scale", explode(array(lit(1), lit(2), lit(3), lit(4))))
      .withColumn("bucket", expr("CAST(day_idx AS BIGINT) div CAST(7 * scale AS BIGINT)"))

    def dayAggOf(ev: DataFrame): DataFrame = {
      val dayAggExprs = Seq(
        count(lit(1)).as("dn"),
        count(col("value")).as("dnval"),
        Exact.dsumPartial(col("value")).as("ds1"),
        Exact.dsumSqPartial(col("value")).as("ds2"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("dnv"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("dhp")) ++
        (0 until 24).map(h =>
          sum(when(hour(col("ts")) === h, 1L).otherwise(0L)).as(f"dh$h%02d"))
      val dayPurch = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("day_idx")).agg(max(col("ts")).as("mpd"))
      val dayConv = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("day_idx"), col("ts"))
        .join(dayPurch, Seq("user_id", "day_idx"))
        .groupBy(col("user_id"), col("day_idx"))
        .agg(sum(when(col("mpd") > col("ts"), 1L).otherwise(0L)).as("dnvl"))
      ev.groupBy(col("user_id"), col("day_idx"))
        .agg(dayAggExprs.head, dayAggExprs.tail: _*)
        .join(dayConv, Seq("user_id", "day_idx"), "left")
        .withColumn("dnvl", coalesce(col("dnvl"), lit(0L)))
    }

    def actOf(ev: DataFrame): DataFrame = {
      val dayPurch = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("day_idx")).agg(max(col("ts")).as("mpd"))
      val dx = withScaleBucket(dayAggOf(ev)).join(
        withScaleBucket(dayPurch)
          .groupBy(col("user_id"), col("scale"), col("bucket"))
          .agg(max(col("day_idx")).as("maxpd")),
        Seq("user_id", "scale", "bucket"), "left")
      val n = sum(col("dn"))
      val nVal = sum(col("dnval"))
      val s1 = sum(col("ds1")).cast("double")
      val s2 = sum(col("ds2")).cast("double")
      val hourCols = (0 until 24).map(h =>
        Exact.r(sum(col(f"dh$h%02d")) * lit(1.0) / n, 6).as(f"h$h%02d"))
      val nView = sum(col("dnv"))
      val nViewLater = sum(when(col("day_idx") < col("maxpd"), col("dnv"))
        .otherwise(col("dnvl")))
      dx.groupBy(col("user_id"), col("scale"), col("bucket"))
        .agg(n.as("n_events"),
          (Seq(
            Exact.r(s1 / nVal, 6).as("mean_val"),
            Exact.r(greatest((s2 - s1 * s1 / nVal) / nVal, lit(0.0)), 6).as("var_val"),
            when(nView === 0, lit(0.0))
              .otherwise(Exact.r(nViewLater * lit(1.0) / nView, 6)).as("recall_rate"))
            ++ hourCols): _*)
    }

    def uwOf(ev: DataFrame): DataFrame = withScaleBucket(
        ev.select(col("user_id"), col("day_idx"), col("event_type")).distinct())
      .select(col("user_id"), col("scale"), col("bucket"), col("event_type"))
      .distinct()

    def repOf(uw: DataFrame): DataFrame = {
      val cnt = uw.groupBy(col("user_id"), col("scale"), col("bucket"))
        .agg(count(lit(1)).as("n"))
      val inter = uw.as("a").join(uw.as("b"),
          col("a.user_id") === col("b.user_id") && col("a.scale") === col("b.scale") &&
          col("b.bucket") === col("a.bucket") - 1 &&
          col("a.event_type") === col("b.event_type"))
        .groupBy(col("a.user_id").as("user_id"), col("a.scale").as("scale"),
          col("a.bucket").as("bucket"))
        .agg(count(lit(1)).as("i"))
      cnt.as("c")
        .join(cnt.as("p"),
          col("p.user_id") === col("c.user_id") && col("p.scale") === col("c.scale") &&
          col("p.bucket") === col("c.bucket") - 1, "left")
        .join(inter.as("x"),
          col("x.user_id") === col("c.user_id") && col("x.scale") === col("c.scale") &&
          col("x.bucket") === col("c.bucket"), "left")
        .select(col("c.user_id").as("user_id"), col("c.scale").as("scale"),
          col("c.bucket").as("bucket"),
          Exact.r(coalesce(col("x.i"), lit(0L)) /
            (col("c.n") + coalesce(col("p.n"), lit(0L)) - coalesce(col("x.i"), lit(0L))),
            6).as("repeat_rate"))
    }

    def e0Of(ev: DataFrame): DataFrame = withScaleBucket(
        ev.filter(col("peer").isNotNull)
          .select(col("user_id"), col("day_idx"), col("peer")).distinct())
      .select(col("scale"), col("bucket"), col("user_id").as("src"), col("peer").as("dst"))
      .distinct()

    // Hierarchical activity rollup prototype: day partials → scale-1
    // partials; coarser scales fold the finer scale's partials
    // (bucket_s = day div 7s nests under trunc division for positive
    // divisors). Every carried partial is an exact long/decimal, so the
    // per-scale finals are bit-identical to the explode spelling.
    def actHier(ev: DataFrame): DataFrame = {
      val dayPurch = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("day_idx")).agg(max(col("ts")).as("mpd"))
      val dayConv = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("day_idx"), col("ts"))
        .join(dayPurch, Seq("user_id", "day_idx"))
        .groupBy(col("user_id"), col("day_idx"))
        .agg(sum(when(col("mpd") > col("ts"), 1L).otherwise(0L)).as("dnvl"))
      val dayAggExprs = Seq(
        count(lit(1)).as("dn"),
        count(col("value")).as("dnval"),
        Exact.dsumPartial(col("value")).as("ds1"),
        Exact.dsumSqPartial(col("value")).as("ds2"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("dnv"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("dhp")) ++
        (0 until 24).map(h =>
          sum(when(hour(col("ts")) === h, 1L).otherwise(0L)).as(f"dh$h%02d"))
      val dayAgg = ev.groupBy(col("user_id"), col("day_idx"))
        .agg(dayAggExprs.head, dayAggExprs.tail: _*)
        .join(dayConv, Seq("user_id", "day_idx"), "left")
        .withColumn("dnvl", coalesce(col("dnvl"), lit(0L)))
        .withColumn("mpday", when(col("dhp") === 1, col("day_idx")))
      val sumCols = Seq("dn", "dnval", "ds1", "ds2", "dnv") ++
        (0 until 24).map(h => f"dh$h%02d")
      // scale-1: resolve each day against its bucket's max purchase day
      val d1 = dayAgg.withColumn("bucket",
        expr("CAST(day_idx AS BIGINT) div CAST(7 AS BIGINT)"))
      val m1 = d1.groupBy(col("user_id"), col("bucket"))
        .agg(max(col("mpday")).as("maxpd"))
      val s1 = d1.join(m1, Seq("user_id", "bucket"))
        .groupBy(col("user_id"), col("bucket"))
        .agg(sum(col("dn")).as("dn"),
          (sumCols.tail.map(c => sum(col(c)).as(c)) ++ Seq(
          sum(when(col("day_idx") < col("maxpd"), col("dnv"))
            .otherwise(col("dnvl"))).as("nvl"),
          sum(col("dnvl")).as("sdnvl"),
          max(col("mpday")).as("maxpd"))): _*)
      // child partials at scale c → parent partials at bucket div k
      def up(child: DataFrame, k: Int): DataFrame = {
        val p = child.withColumn("pb",
          expr(s"CAST(bucket AS BIGINT) div CAST($k AS BIGINT)"))
        val pm = p.groupBy(col("user_id"), col("pb"))
          .agg(max(col("maxpd")).as("pmaxpd"),
            // the child bucket holding the parent's last purchase day
            max(when(col("maxpd").isNotNull, col("bucket"))).as("mb"))
        p.join(pm, Seq("user_id", "pb"))
          .groupBy(col("user_id"), col("pb"))
          .agg(sum(col("dn")).as("dn"),
            (sumCols.tail.map(c => sum(col(c)).as(c)) ++ Seq(
            sum(when(col("bucket") < col("mb"), col("dnv"))
              .when(col("bucket") === col("mb"), col("nvl"))
              .otherwise(col("sdnvl"))).as("nvl"),
            sum(col("sdnvl")).as("sdnvl"),
            max(col("maxpd")).as("maxpd"))): _*)
          .withColumnRenamed("pb", "bucket")
      }
      val s1c = s1.cache()
      val s2 = up(s1c, 2).cache()
      val s3 = up(s1c, 3)
      val s4 = up(s2, 2)
      def finals(s: DataFrame, scale: Int): DataFrame = {
        val n = col("dn")
        val nVal = col("dnval")
        val v1 = col("ds1").cast("double")
        val v2 = col("ds2").cast("double")
        s.select(
          Seq(col("user_id"), lit(scale).as("scale"), col("bucket"),
            n.as("n_events"),
            Exact.r(v1 / nVal, 6).as("mean_val"),
            Exact.r(greatest((v2 - v1 * v1 / nVal) / nVal, lit(0.0)), 6).as("var_val"),
            when(col("dnv") === 0, lit(0.0))
              .otherwise(Exact.r(col("nvl") * lit(1.0) / col("dnv"), 6)).as("recall_rate")) ++
          (0 until 24).map(h =>
            Exact.r(col(f"dh$h%02d") * lit(1.0) / n, 6).as(f"h$h%02d")): _*)
      }
      finals(s1c, 1).unionAll(finals(s2, 2)).unionAll(finals(s3, 3))
        .unionAll(finals(s4, 4))
    }

    val keys = Seq("scale", "bucket")

    if (args.headOption.contains("--check")) {
      val old = actOf(evBase)
      val neu = actHier(evBase)
      val extraOld = old.exceptAll(neu).count()
      val extraNew = neu.exceptAll(old).count()
      println(s"[profile] exact-compare old-vs-hier: old-only=$extraOld new-only=$extraNew" +
        s" (old=${old.count()}, new=${neu.count()})")
      spark.stop(); return
    }
    if (args.headOption.contains("--ab")) {
      time("B_act_explode")(actOf(evBase))
      time("B_act_hier")(actHier(evBase))
      time("B_act_explode2")(actOf(evBase))
      time("B_act_hier2")(actHier(evBase))
      spark.stop(); return
    }

    // --- component timings (each includes its own evBase scan — at
    // large SF the real query also rescans when the cache gate trips)
    time("full_q85")(Features.q85Core(spark, dir))
    time("A_dayagg")(dayAggOf(evBase))
    time("B_act")(actOf(evBase))
    time("C_uw")(uwOf(evBase))
    time("D_uw+rep") { val uw = uwOf(evBase).cache(); repOf(uw) }
    time("E_e0")(e0Of(evBase))
    time("F_e0+deg") { val e0 = e0Of(evBase); Graph.q20DegreesKeyed(e0, keys) }
    time("G_e0+und+nad") {
      val e0 = e0Of(evBase).cache()
      val und = Graph.symmetrizedKeyed(e0, keys).distinct()
      Graph.q22FromUndKeyed(und, keys)
    }
    time("H_e0+und+cc") {
      val e0 = e0Of(evBase).cache()
      val und = Graph.symmetrizedKeyed(e0, keys).distinct()
      Graph.q23FromUndKeyed(und.filter(col("src") =!= col("dst")), keys)
    }
    time("full_q85_again")(Features.q85Core(spark, dir))
    spark.stop()
  }
}
