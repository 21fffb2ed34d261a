package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory each entry maps to. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The 3-way join + aggregate exercises scan, broadcast/shuffle join
    * planning and partial aggregation in one plan. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q03JoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Features.queries ++ ops.Graph.queries ++
      ops.Metrics.queries ++ ops.Text.queries ++ ops.Dedup.queries ++
      ops.Ann.queries ++ ops.Sessions.queries ++ ops.Multimodal.queries ++
      ops.Components.queries ++ ops.TimeJoins.queries ++ ops.Sampling.queries ++
      ops.Corpus.queries ++ ops.Fused.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracles ++ ops.Features.oracles ++ ops.Graph.oracles ++
      ops.Metrics.oracles ++ ops.Text.oracles ++ ops.Ann.oracles ++
      ops.Sessions.oracles ++ ops.TimeJoins.oracles ++ ops.Sampling.oracles ++
      ops.Dedup.oracles ++ ops.Components.oracles ++ ops.Multimodal.oracles ++
      ops.Corpus.oracles ++ ops.Fused.oracles
}
