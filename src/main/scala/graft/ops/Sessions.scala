package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch sessionization (SURVEY.md §2.F q42) — the batch twin of
  * `streaming.EventStream.sessionize`: a new session starts when the
  * gap since the user's previous event exceeds 30 minutes.
  *
  * Classic two-window formulation: lag → boundary flag → running sum
  * inside one user-partitioned sort (a single shuffle on user_id; both
  * windows share the same partitioning so Catalyst plans one exchange
  * + one sort). Epoch seconds keep Spark µs and DuckDB ns in exact
  * agreement.
  */
object Sessions {

  def q42Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("sec"))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
      .withColumn("new_sess",
        when(col("gap").isNull || col("gap") > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(w))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("sec")).as("start_sec"),
        max(col("sec")).as("end_sec"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val oracles: Map[String, String] = Map(
    "q42_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS sec FROM events),
        | g AS (SELECT user_id, event_id, sec,
        |   sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS gap
        |  FROM e),
        | s AS (SELECT user_id, sec,
        |   CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY sec, event_id) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, min(sec) AS start_sec, max(sec) AS end_sec,
        | count(*) AS n_events
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q42_sessionize" -> (q42Sessionize _)
  )
}
