package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal join operators Spark lacks natively (SURVEY.md §4: as-of
  * join, range join) — the CDR pipeline's "state at call time" lookups.
  *
  * q49 AS-OF: attach to each event the user's most recent order at or
  * before the event time. Implementation is the distributed as-of
  * technique: union both sides tagged, ONE shuffle+sort per user, and a
  * running last-non-null window carries the latest right-side state
  * forward — no join explosion, no per-key driver work, and the plan is
  * a single Exchange + Sort regardless of how many right rows precede
  * each event. The oracle spells the IDENTICAL union+window formulation
  * (DuckDB's native ASOF JOIN breaks ties arbitrarily; this one is
  * deterministic by construction).
  *
  * q50 RANGE: count/aggregate right rows within a time interval of each
  * left row. Naive range joins explode to |L|·|R| per key; the standard
  * scale trick is bucketizing — join on the coarse time bucket (each
  * left row probes its ±1 neighbor buckets) then filter the precise
  * range, keeping the join ~linear when the interval ≈ bucket width.
  */
object TimeJoins {

  /** q49: for each event, the user's latest order (epoch secs) at or
    * before the event; orders deduped to one row per (user, second)
    * (max orderkey) so the as-of match is deterministic. */
  def q49AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"))
    val ord = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("user_id"),
        unix_timestamp(col("o_orderdate")).as("sec"))
      .agg(max(col("o_orderkey")).as("o_key"))
    // tag=0 rows (orders) sort BEFORE tag=1 (events) at equal seconds,
    // so an order dated exactly at the event time is visible to it
    val tagged = ord.select(col("user_id"), col("sec"), lit(0).as("tag"),
        lit(null).cast("long").as("event_id"), col("o_key"))
      .unionAll(ev.select(col("user_id"), col("sec"), lit(1).as("tag"),
        col("event_id"), lit(null).cast("long").as("o_key")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("tag"), col("event_id"), col("o_key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_key", last(col("o_key"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("user_id"), col("event_id"), col("sec"),
        col("asof_key"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** q50: burst detection — per event, the user's OTHER events within
    * ±1 h (the reference's intra-day call-burst signal, utils.py
    * time_gap family, as an interval join). Bucketized range join:
    * equi-join on the hour bucket with the probe side exploded to ±1
    * neighbor buckets, precise filter after — ~linear, never |L|·|R|. */
  def q50RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val window = 3600L // ±1h
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("esec"))
    val build = ev.withColumn("bucket", expr(s"esec div $window"))
      .select(col("user_id"), col("bucket"),
        col("event_id").as("other_id"), col("esec").as("osec"))
    // probe side explodes to its bucket ±1 — covers every neighbor
    // within ±window without an all-pairs blowup
    val probe = ev.withColumn("bucket",
      explode(array(expr(s"esec div $window - 1"),
        expr(s"esec div $window"), expr(s"esec div $window + 1"))))
    probe.join(build, Seq("user_id", "bucket"))
      .filter(col("other_id") =!= col("event_id") &&
        abs(col("osec") - col("esec")) <= window)
      .groupBy(col("user_id"), col("event_id"))
      .agg(count(lit(1)).as("n_nearby"),
        min(col("osec") - col("esec")).as("min_delta"),
        max(col("osec") - col("esec")).as("max_delta"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val oracles: Map[String, String] = Map(
    "q49_asof_join" ->
      """WITH ev AS (SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS sec FROM events),
        | ord AS (SELECT o_custkey AS user_id, floor(epoch(o_orderdate))::BIGINT AS sec,
        |   max(o_orderkey) AS o_key
        |  FROM orders GROUP BY 1, 2),
        | tagged AS (
        |  SELECT user_id, sec, 0 AS tag, NULL::BIGINT AS event_id, o_key FROM ord
        |  UNION ALL
        |  SELECT user_id, sec, 1, event_id, NULL FROM ev),
        | carried AS (SELECT user_id, sec, tag, event_id,
        |   last_value(o_key IGNORE NULLS) OVER (PARTITION BY user_id
        |     ORDER BY sec, tag, event_id NULLS FIRST, o_key NULLS FIRST
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_key
        |  FROM tagged)
        |SELECT user_id, event_id, sec, asof_key
        |FROM carried WHERE tag = 1 ORDER BY user_id, event_id""".stripMargin,
    "q50_range_join" ->
      """WITH ev AS (SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS esec FROM events)
        |SELECT a.user_id, a.event_id, count(*) AS n_nearby,
        | min(b.esec - a.esec) AS min_delta, max(b.esec - a.esec) AS max_delta
        |FROM ev a JOIN ev b ON a.user_id = b.user_id
        |  AND b.event_id <> a.event_id AND abs(b.esec - a.esec) <= 3600
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q49_asof_join" -> (q49AsofJoin _),
    "q50_range_join" -> (q50RangeJoin _)
  )
}
