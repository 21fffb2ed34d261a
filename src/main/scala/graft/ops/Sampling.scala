package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling / data-mixing operators — the class-rebalance
  * and source-mix steps of a training-data pipeline (reference analog:
  * new_train_1.py:59 node_sample_TSNE's fraud-rate downsampling; LLM
  * side: corpus mixing weights).
  *
  * All sampling is LCG-hash-of-key based, NOT RNG: the same row set
  * survives on every engine, every rerun, every partitioning — which
  * makes the samplers SQL-oracle-checkable and the experiments
  * reproducible. A filter is one codegen'd predicate pushed into the
  * scan; no shuffle at all.
  */
object Sampling {

  /** Keep-bucket in [0,100) from an LCG hash of the key column. The key
    * reduces mod 2³¹ BEFORE the multiply so the product never wraps
    * int64 (see Exact.lcgTrain80 — same fix, same spelling). */
  private def bucket(key: String) =
    expr(s"((($key % 2147483648) * 1103515245 + 12345) % 2147483648) % 100")
  private def bucketSql(key: String) =
    s"((($key % 2147483648) * 1103515245 + 12345) % 2147483648) % 100"

  /** q51: class-balanced downsample — keep every minority-class row
    * (label 0, ~10%) and a deterministic ~11% of the rest, yielding a
    * roughly 1:1 training set (node_sample_TSNE's fraud-rate logic). */
  def q51BalancedSample(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), (col("label") === 0).cast("int").as("y"))
      .filter(col("y") === 1 || bucket("vec_id") < 11)
      .orderBy(col("vec_id"))

  /** q52: corpus source/language mixing — English docs kept at 80%,
    * everything else at 40% (upsweighting a target language, the
    * standard LLM data-mix move), decided by the doc_id hash. */
  def q52SourceMix(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"))
      .filter(bucket("doc_id") <
        when(col("lang") === "en", lit(80)).otherwise(lit(40)))
      .orderBy(col("doc_id"))

  val oracles: Map[String, String] = Map(
    "q51_balanced_sample" ->
      s"""SELECT vec_id, CASE WHEN label = 0 THEN 1 ELSE 0 END AS y
        |FROM embeddings
        |WHERE label = 0 OR ${bucketSql("vec_id")} < 11
        |ORDER BY 1""".stripMargin,
    "q52_source_mix" ->
      s"""SELECT doc_id, lang, source
        |FROM documents
        |WHERE ${bucketSql("doc_id")} <
        |  CASE WHEN lang = 'en' THEN 80 ELSE 40 END
        |ORDER BY 1""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_balanced_sample" -> (q51BalancedSample _),
    "q52_source_mix" -> (q52SourceMix _)
  )
}
