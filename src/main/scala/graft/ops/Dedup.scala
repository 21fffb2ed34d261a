package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based near-duplicate detection (SURVEY.md §2.E): MinHash+LSH
  * banding and SimHash hamming-band bucketing. Both are the standard
  * linear-candidate alternatives to the quadratic all-pairs Jaccard of
  * q31 — at 100 TB you never enumerate pairs, you bucket signatures and
  * only pair within buckets.
  *
  * All hashing is `xxhash64` (codegen'd Catalyst expression, seed mixed
  * in as a leading column) — engine-specific bits, so these are
  * rows-only driver checks; DedupSpec pins the semantic invariants on
  * constructed inputs with known duplicates.
  */
object Dedup {

  /** Per-(seed, band) MinHash signature machinery, parameterized by a
    * (doc_id, shingle) DataFrame so specs can feed synthetic docs. */
  private[graft] def minhashCandidates(
      sh: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    val mins: Seq[Column] = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"m$i"))
    val sig = sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    // band j = hash of its `rows` consecutive signature slots
    val bandCols: Seq[Column] = (0 until bands).map { j =>
      val slots = (j * rows until (j + 1) * rows).map(i => col(s"m$i"))
      struct(lit(j).as("band"), xxhash64(slots: _*).as("bh"))
    }
    val buckets = sig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
    buckets.as("x")
      .join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .agg(countDistinct(col("x.band")).as("n_bands"))
  }

  /** q32: MinHash(16 hashes) + LSH(4 bands × 4 rows) candidate pairs
    * over word-trigram shingles, refined with the exact Jaccard of the
    * colliding docs (the verify step real pipelines run post-LSH). */
  def q32DedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    // sh feeds the signature build, both refinement joins and sizing —
    // persist once instead of re-shingling the corpus 4×
    val sh = Text.shingled(spark, dir).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val cands = minhashCandidates(sh, numHashes = 16, bands = 4)
    // exact-Jaccard refinement for CANDIDATES only — never all pairs
    val inter = cands.select(col("id1").as("jid1"), col("id2").as("jid2"))
      .join(sh.as("a"), col("jid1") === col("a.doc_id"))
      .join(sh.as("b"),
        col("jid2") === col("b.doc_id") && col("a.shingle") === col("b.shingle"))
      .groupBy(col("jid1"), col("jid2"))
      .agg(count(lit(1)).as("inter"))
    cands
      .join(inter,
        col("id1") === col("jid1") && col("id2") === col("jid2"), "left")
      .join(sizes.as("s1"), col("id1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("id2") === col("s2.doc_id"))
      .select(col("id1"), col("id2"), col("n_bands"),
        round(coalesce(col("inter"), lit(0L)) * lit(1.0) /
          (col("s1.sz") + col("s2.sz") - coalesce(col("inter"), lit(0L))), 6)
          .as("jaccard"))
      .orderBy(col("id1"), col("id2"))
  }

  /** 64-bit SimHash over a (doc_id, token) DataFrame: per-bit weighted
    * votes, majority per bit, bits packed into one BIGINT.
    *
    * Token occurrences first collapse to (doc_id, token-hash, count) —
    * map-side partial aggregation shrinks the input to the 64 bit-vote
    * sums by the token repeat factor, and each token hashes ONCE instead
    * of per occurrence. The ±1 vote `Σ ±c > 0` is spelled as
    * `2·Σ(c·bit) > Σc` (identical result incl. ties) so each bit costs
    * one shift-and-multiply-add, not a conditional. All codegen'd, no
    * UDF. */
  private[graft] def simhash(tok: DataFrame): DataFrame = {
    val h = tok.groupBy(col("doc_id"), xxhash64(col("token")).as("h"))
      .agg(count(lit(1)).as("c"))
    val votes: Seq[Column] =
      sum(col("c")).as("t") +: (0 until 64).map(b =>
        sum(col("c") * expr(s"(h >> $b) & 1")).as(s"o$b"))
    val packed = (0 until 64).map(b =>
      when(col(s"o$b") * 2 > col("t"), expr(s"CAST(1 AS BIGINT) << $b")).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    h.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), packed.as("simhash"))
  }

  /** q33: SimHash near-dup — band the 64-bit sketch into 4×16-bit
    * chunks (any pair within hamming ≤ 3 shares ≥ 1 exact chunk by
    * pigeonhole), bucket-join on (band, chunk), keep hamming ≤ 3. */
  def q33DedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val sig = simhash(tok)
    val bandCols = (0 until 4).map(j =>
      struct(lit(j).as("band"), expr(s"(simhash >> ${16 * j}) & 65535").as("chunk")))
    val buckets = sig
      .select(col("doc_id"), col("simhash"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("simhash"),
        col("b.band").as("band"), col("b.chunk").as("chunk"))
    buckets.as("x")
      .join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"),
        expr("bit_count(x.simhash ^ y.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("id1"), col("id2"))
  }

  /** q55: near-dup cluster keep-list — the step an LLM-data pipeline
    * actually ships: MinHash candidate pairs (q32) refined at
    * Jaccard ≥ 0.5 become edges, connected components group transitive
    * near-dups into clusters, and the minimum doc_id per cluster is the
    * canonical survivor. Emits only clustered docs (singletons trivially
    * keep themselves). Same distributed CC as q47 — O(log diameter)
    * rounds, no driver iteration. Hash-based candidates → rows-only
    * driver check; DedupSpec pins one-keeper-per-cluster and
    * keeper = min(doc_id). */
  def q55DedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = q32DedupMinhash(spark, dir)
      .filter(col("jaccard") >= 0.5)
      .select(col("id1").as("src"), col("id2").as("dst"))
    Components.connectedComponents(pairs)
      .select(col("node").as("doc_id"), col("comp").as("cluster"),
        (col("node") === col("comp")).as("keep"))
      .orderBy(col("cluster"), col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_dedup_minhash" -> (q32DedupMinhash _),
    "q33_dedup_simhash" -> (q33DedupSimhash _),
    "q55_dedup_clusters" -> (q55DedupClusters _)
  )
}
