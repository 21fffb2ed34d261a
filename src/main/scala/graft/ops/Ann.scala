package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector similarity search over `embeddings` (SURVEY.md §2.E): exact
  * cosine top-k, random-hyperplane LSH ANN, and embedding-cosine
  * near-dup pairs — the retrieval/dedup primitives of an LLM data
  * pipeline, and the distributed analog of the reference's node-feature
  * similarity handling (Amazon/Yelp adjacency features).
  *
  * Exactness: a float dot product is accumulation-order dependent, so
  * Spark and DuckDB would disagree in the last ulp. Both sides quantize
  * each product to DECIMAL(18,9)·DECIMAL(18,9) and sum decimals —
  * exact, order-independent, and (because no IEEE double is exactly
  * halfway between two 9-dp decimals) identically rounded in both
  * engines. Norm/divide/round are then single IEEE double ops.
  *
  * Scale: q34 broadcasts the (small) query set against the corpus and
  * takes per-partition partial top-k before the final window — the
  * corpus never shuffles. q35 buckets by LSH signature first, the
  * standard sublinear path. q36 is all-pairs on one side of a
  * small-dimension blocking key; at 100 TB you'd swap the block key for
  * IVF cluster ids, the plan shape is identical.
  */
object Ann {

  /** Exact decimal dot product of two float-array columns (zip_with +
    * aggregate HOFs — codegen'd, no shuffle, no UDF). */
  private def dotDec(a: String, b: String): Column =
    // acc is DECIMAL(28,18): adding a DECIMAL(37,18) product lands exactly
    // on DECIMAL(38,18) (no scale trim), and the cast back is exact for
    // |sum| < 10^10 — far above any 64-dim unit-ish dot product.
    expr(s"""aggregate(
      | zip_with($a, $b, (x, y) -> CAST(CAST(x AS DOUBLE) AS DECIMAL(18,9)) * CAST(CAST(y AS DOUBLE) AS DECIMAL(18,9))),
      | CAST(0 AS DECIMAL(28,18)),
      | (acc, v) -> CAST(acc + v AS DECIMAL(28,18)))""".stripMargin)

  /** Exact decimal squared norm. */
  private def norm2Dec(a: String): Column = dotDec(a, a)

  private def cosine(a: String, b: String): Column =
    round(dotDec(a, b).cast("double") /
      (sqrt(norm2Dec(a).cast("double")) * sqrt(norm2Dec(b).cast("double"))), 6)

  /** DuckDB spelling of the same math via position-joined unnest —
    * identical decimal quantization and exact sums. */
  private def cosineSql(qTab: String, cTab: String): String =
    s"""qe AS (SELECT vec_id AS qid, generate_subscripts(embedding, 1) AS pos,
      |   unnest(embedding) AS x FROM $qTab),
      | ce AS (SELECT vec_id AS cid, generate_subscripts(embedding, 1) AS pos,
      |   unnest(embedding) AS y FROM $cTab),
      | dots AS (SELECT qid, cid,
      |   CAST(sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,9)) * CAST(CAST(y AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) AS dot
      |  FROM qe JOIN ce USING (pos) GROUP BY 1, 2),
      | nq AS (SELECT qid, CAST(sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,9)) * CAST(CAST(x AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) AS n2
      |  FROM qe GROUP BY 1),
      | nc AS (SELECT cid, CAST(sum(CAST(CAST(y AS DOUBLE) AS DECIMAL(18,9)) * CAST(CAST(y AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) AS n2
      |  FROM ce GROUP BY 1),
      | cosres AS (SELECT qid, cid,
      |   round(dot / (sqrt(nq.n2) * sqrt(nc.n2)), 6) AS cos
      |  FROM dots JOIN nq USING (qid) JOIN nc USING (cid))""".stripMargin

  /** q34: brute-force cosine top-10 per query (vec_id < 10 are the
    * queries, the rest the corpus). Query side broadcasts; per-query
    * ranking is a window over qid — the corpus stays put. */
  def q34AnnCosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid"))
    c.join(broadcast(q))
      .select(col("qid"), col("cid"), cosine("qe", "ce").as("cos"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 10)
      .orderBy(col("qid"), col("rk"))
  }

  /** q35: random-hyperplane LSH ANN — 12 Rademacher hyperplanes derived
    * from xxhash64(plane, dim) signs give a 12-bit bucket; queries only
    * compare against corpus vectors in their bucket. Hash bits are
    * engine-specific → rows-only check; AnnSpec verifies recall against
    * q34 ground truth. */
  def q35AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val planes = 12
    // sign_p(v) = Σ_d ±v[d] > 0, with the ± pattern a deterministic
    // function of (p, d): bit 0 of xxhash64(p, d).
    def bucketOf(vec: String): Column = {
      val bits = (0 until planes).map { p =>
        val s = expr(
          s"""aggregate(zip_with($vec, sequence(1, size($vec)),
            |  (x, d) -> CASE WHEN (xxhash64($p, d) & 1) = 1
            |            THEN CAST(x AS DOUBLE) ELSE -CAST(x AS DOUBLE) END),
            | CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)
        when(s > 0, lit(1L << p)).otherwise(lit(0L))
      }
      bits.reduce(_.bitwiseOR(_))
    }
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        bucketOf("embedding").as("bucket"))
    val c = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"),
        bucketOf("embedding").as("bucket"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid"))
    c.join(broadcast(q), Seq("bucket"))
      .select(col("qid"), col("cid"), col("bucket"), cosine("qe", "ce").as("cos"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 10)
      .orderBy(col("qid"), col("rk"))
  }

  /** q36: embedding near-dup pairs — cosine ≥ 0.9 over canonical
    * id1 < id2 pairs, blocked by the cluster label (the IVF-style
    * pruning: near-dups share a coarse cluster; at scale the label is a
    * learned centroid id). */
  def q36DedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label"))
    emb.as("a")
      .join(emb.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        col("a.label").as("label"),
        cosine("a.embedding", "b.embedding").as("cos"))
      .filter(col("cos") >= 0.9)
      .orderBy(col("id1"), col("id2"))
  }

  val oracles: Map[String, String] = Map(
    "q34_ann_cosine_topk" -> {
      s"""WITH qt AS (SELECT * FROM embeddings WHERE vec_id < 10),
        | ct AS (SELECT * FROM embeddings WHERE vec_id >= 10),
        | ${cosineSql("qt", "ct")},
        | ranked AS (SELECT qid, cid, cos,
        |   row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
        |  FROM cosres)
        |SELECT qid, cid, cos, rk FROM ranked WHERE rk <= 10
        |ORDER BY qid, rk""".stripMargin
    },
    "q36_dedup_embedding" -> {
      s"""WITH qt AS (SELECT * FROM embeddings),
        | ct AS (SELECT * FROM embeddings),
        | lab AS (SELECT vec_id, label FROM embeddings),
        | ${cosineSql("qt", "ct")}
        |SELECT qid AS id1, cid AS id2, la.label AS label, cos
        |FROM cosres
        | JOIN lab la ON la.vec_id = qid
        | JOIN lab lb ON lb.vec_id = cid
        |WHERE qid < cid AND la.label = lb.label AND cos >= 0.9
        |ORDER BY 1, 2""".stripMargin
    }
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_ann_cosine_topk" -> (q34AnnCosineTopk _),
    "q35_ann_lsh" -> (q35AnnLsh _),
    "q36_dedup_embedding" -> (q36DedupEmbedding _)
  )
}
