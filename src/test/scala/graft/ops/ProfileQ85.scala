package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Throwaway component profiler for q85 — times each sub-DAG of
  * [[Features.q85Core]] in isolation (noop-materialized, cache dropped
  * between components) so optimization budget goes where the time is.
  * Calls the SAME private[graft] builders q85Core composes
  * (Features.q85EvBase/q85DayAgg/q85Activity/q85Uw/q85Repeat/q85Edges),
  * so the profiled sub-DAGs can never desynchronize from the production
  * spelling. NOT a correctness artifact — conclusions are re-verified
  * against the real query before any change lands. The one local body
  * here, [[actHier]], is deliberately NOT production code: it is the
  * hierarchical-rollup prototype the A/B REJECTED (see SURVEY §7), kept
  * runnable so the measured negative result stays reproducible.
  *
  * Run: SPARK_GRAFT_SF_DIR=target/sf1 sbt "Test/runMain graft.ops.ProfileQ85 [--check|--ab]"
  */
object ProfileQ85 {

  def main(args: Array[String]): Unit = {
    // fail fast on a missing dir — a hardcoded machine default would
    // oversubscribe or mis-measure anywhere but the original sandbox
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      sys.error("SPARK_GRAFT_SF_DIR is unset — point it at a testdata " +
        "scale-factor directory, e.g. SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1"))
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
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

    def evBase = Features.q85EvBase(spark, dir)

    // Hierarchical activity rollup prototype: day partials → scale-1
    // partials; coarser scales fold the finer scale's partials
    // (bucket_s = day div 7s nests under trunc division for positive
    // divisors). Every carried partial is an exact long/decimal, so the
    // per-scale finals are bit-identical to the explode spelling.
    // REJECTED by the --ab run (slower than the explode at sf0.1/sf1);
    // kept as the reproducible negative result, not as a mirror of
    // production code (day partials come from the SHARED q85DayAgg).
    def actHier(ev: DataFrame): DataFrame = {
      val dayAgg = Features.q85DayAgg(ev)
        .withColumn("mpday", when(col("dhp") === 1, col("day_idx")))
      val sumCols = Seq("dn", "dnval", "ds1", "ds2", "dnv") ++
        (0 until 12).map(k => f"dp$k%02d") // packed hour pairs sum as longs
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
            Exact.r(Features.unpackHour(col(f"dp${h / 2}%02d"), h) * lit(1.0) / n, 6)
              .as(f"h$h%02d")): _*)
      }
      finals(s1c, 1).unionAll(finals(s2, 2)).unionAll(finals(s3, 3))
        .unionAll(finals(s4, 4))
    }

    val keys = Seq("scale", "bucket")

    if (args.headOption.contains("--check")) {
      val old = Features.q85Activity(evBase)
      val neu = actHier(evBase)
      val extraOld = old.exceptAll(neu).count()
      val extraNew = neu.exceptAll(old).count()
      println(s"[profile] exact-compare old-vs-hier: old-only=$extraOld new-only=$extraNew" +
        s" (old=${old.count()}, new=${neu.count()})")
      spark.stop(); return
    }
    if (args.headOption.contains("--ab")) {
      time("B_act_explode")(Features.q85Activity(evBase))
      time("B_act_hier")(actHier(evBase))
      time("B_act_explode2")(Features.q85Activity(evBase))
      time("B_act_hier2")(actHier(evBase))
      spark.stop(); return
    }
    // Window-count prototype for the keyed neighbor-degree core: und is
    // SYMMETRIC, so deg(x) counted by src equals deg(x) counted by dst —
    // `count(*) OVER (PARTITION BY keys, dst)` attaches the neighbor's
    // degree to each edge row without the separate degree aggregate and
    // its shuffle-join (whose sort-merge re-sorts und anyway).
    def nadWin(und: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy((keys :+ "dst").map(col): _*)
      und.withColumn("d", count(lit(1)).over(w))
        .groupBy(keys.map(col) :+ col("src").as("node"): _*)
        .agg(Exact.r(sum(col("d")) * lit(1.0) / count(lit(1)), 6).as("nbr_avg_deg"),
          count(lit(1)).as("n_nbrs"))
    }
    def undOf = Graph.symmetrizedKeyed(Features.q85Edges(evBase), keys).distinct()
    if (args.headOption.contains("--ab-nad")) {
      val a = Graph.q22FromUndKeyed(undOf, keys)
      val b = nadWin(undOf)
      println(s"[profile] exact-compare join-vs-window: a-only=${a.exceptAll(b).count()}" +
        s" b-only=${b.exceptAll(a).count()}")
      time("G_nad_join")(Graph.q22FromUndKeyed(undOf, keys))
      time("G_nad_window")(nadWin(undOf))
      time("G_nad_join2")(Graph.q22FromUndKeyed(undOf, keys))
      time("G_nad_window2")(nadWin(undOf))
      spark.stop(); return
    }

    // --- component timings (each includes its own evBase scan — at
    // large SF the real query also rescans when the cache gate trips)
    time("full_q85")(Features.q85Core(spark, dir))
    time("A_dayagg")(Features.q85DayAgg(evBase))
    time("B_act")(Features.q85Activity(evBase))
    time("C_uw")(Features.q85Uw(evBase))
    time("D_uw+rep")(Features.q85Repeat(Features.q85Uw(evBase)))
    time("E_e0")(Features.q85Edges(evBase))
    time("F_e0+deg")(Graph.q20DegreesKeyed(Features.q85Edges(evBase), keys))
    time("G_e0+und+nad") {
      val und = Graph.symmetrizedKeyed(Features.q85Edges(evBase), keys).distinct()
      Graph.q22FromUndKeyed(und, keys)
    }
    time("H_e0+und+cc") {
      val und = Graph.symmetrizedKeyed(Features.q85Edges(evBase), keys).distinct()
      Graph.q23FromUndKeyed(und.filter(col("src") =!= col("dst")), keys)
    }
    time("full_q85_again")(Features.q85Core(spark, dir))
    spark.stop()
  }
}
