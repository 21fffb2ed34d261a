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

  /** Budget for q69: half the corpus tokens — a fixed operator
    * parameter like q62's context length. */
  private val budgetFrac = 2.0

  /** q69: temperature-based source mixing under a token budget — the
    * data-mixing step LLM pretraining actually runs (Pile/LLaMA-style):
    * re-weight sources by n_s^(1/2) (temperature α = 0.5 upweights
    * rare sources relative to their raw mass), scale shares to a global
    * token budget (N/2 here), cap at keep-everything, and decide each
    * doc by the SAME wrap-safe LCG hash q51/q52 use — deterministic,
    * engine-portable, reproducible. Emits every doc with its source's
    * integer keep-threshold (per-million) and the keep decision.
    *
    * Oracle exactness: n_s is an exact integer sum; sqrt is correctly
    * rounded by IEEE 754 in both engines (the q64 lesson), then
    * quantized through [[Exact.r]] to DECIMAL so the share normalizer
    * is an order-independent exact sum; every later step is the same
    * IEEE double expression evaluated identically, and the final
    * threshold compare is pure integer arithmetic.
    *
    * Scale: one map-side-combined aggregation over the corpus to get
    * source masses (|sources| rows), a broadcast of the rate table,
    * and a codegen'd projection — the corpus itself never shuffles
    * (the final orderBy is the output-determinism convention). */
  def q69MixSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    mixKeep(d, budgetFrac).orderBy(col("doc_id"))
  }

  /** The q69 mixing core over an arbitrary `(doc_id, source, n_tok)`
    * frame — shared by [[q69MixSample]] (raw corpus) and
    * `CurationPipeline`'s terminal mix gate (post-curation survivors,
    * where source masses must reflect what actually survived the
    * filters, not the raw crawl). Emits every input row plus its
    * source's integer keep-threshold (per-million) and the LCG keep
    * decision; exactness and scale notes on [[q69MixSample]]. */
  private[graft] def mixKeep(d: DataFrame, budget: Double): DataFrame = {
    val src = d.groupBy(col("source")).agg(sum(col("n_tok")).as("n_s"))
      .withColumn("r", Exact.r(sqrt(col("n_s")), 6).cast("decimal(18,6)"))
    val tot = src.agg(sum(col("r")).as("rsum"), sum(col("n_s")).as("n_total"))
    val rates = src.crossJoin(broadcast(tot))
      .withColumn("keep_frac",
        least(lit(1.0),
          (col("r").cast("double") / col("rsum").cast("double"))
            * (col("n_total") / lit(budget)) / col("n_s")))
      .select(col("source"),
        floor(col("keep_frac") * lit(1000000.0)).cast("long").as("thresh"))
    d.join(broadcast(rates), Seq("source"))
      .select(col("doc_id"), col("source"), col("n_tok"), col("thresh"),
        (expr(s"((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 % 1000000")
          < col("thresh")).as("kept"))
  }

  val oracles: Map[String, String] = Map(
    "q69_mix_sample" ->
      s"""WITH d AS (SELECT doc_id, source,
        |   len(string_split(text, ' '))::BIGINT AS n_tok FROM documents),
        | src AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS n_s,
        |   CAST(floor(sqrt(CAST(sum(n_tok) AS BIGINT)) * 1e6 + 0.5) / 1e6
        |     AS DECIMAL(18,6)) AS r
        |  FROM d GROUP BY 1),
        | tot AS (SELECT sum(r) AS rsum,
        |   CAST(sum(n_s) AS BIGINT) AS n_total FROM src),
        | rates AS (SELECT source,
        |   CAST(floor(least(1.0,
        |     (CAST(r AS DOUBLE) / CAST(rsum AS DOUBLE))
        |       * (n_total / $budgetFrac) / n_s) * 1000000.0) AS BIGINT) AS thresh
        |  FROM src CROSS JOIN tot)
        |SELECT d.doc_id, d.source, d.n_tok, rates.thresh,
        | ((d.doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 % 1000000
        |   < rates.thresh AS kept
        |FROM d JOIN rates USING (source)
        |ORDER BY 1""".stripMargin,
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
    "q52_source_mix" -> (q52SourceMix _),
    "q69_mix_sample" -> (q69MixSample _)
  )
}
