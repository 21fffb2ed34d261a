package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.F): media payloads travel as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract run per-partition over batches of payload bytes.
  *
  * The container has no image/audio codecs, so `fakeDecode` is a
  * clearly-marked deterministic stand-in — the Spark-side contract
  * (schema, batching, partition-local execution, fixed-width feature
  * output) is the real, tested part; swapping in a JNI/FFmpeg decoder
  * changes one function.
  */
object Multimodal {

  /** Typed payload row: what a media table looks like at 100 TB —
    * metadata columns prunable without touching the (huge) payload. */
  case class Payload(doc_id: Long, payload: Array[Byte])
  case class MediaFeature(doc_id: Long, kind: String, n_bytes: Long,
    features: Array[Float])

  /** q41: typed metadata extraction over a binary column — byte length,
    * leading magic bytes, kind classification, portable content hash —
    * all codegen'd column expressions; the payload is never
    * deserialized on the driver. Fully oracle-checked (the hash is
    * [[Exact.portableHash]], i.e. md5 — engine-identical over the same
    * bytes); MultimodalSpec additionally pins semantics. */
  def q41MultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        hex(substring(col("payload"), 1, 4)).as("magic"),
        // magic-based kind sniffing, the shape real pipelines use
        // (here over text payloads, so `kind` is mostly "bin")
        when(hex(substring(col("payload"), 1, 3)) === "FFD8FF", "jpeg")
          .when(hex(substring(col("payload"), 1, 4)) === "89504E47", "png")
          .when(substring(col("payload"), 1, 4).cast("string") === "RIFF", "wav")
          .otherwise("bin").as("kind"),
        Exact.portableHash(col("payload"), 15).as("content_hash"))
      .orderBy(col("doc_id"))

  /** DuckDB 1.0 can't slice BLOBs, so the oracle slices the VARCHAR
    * then encodes — byte-identical to Spark's binary slice while the
    * corpus is ASCII (it is: octet_length = length for every doc at
    * every SF; a multibyte corpus would need a blob-slice UDF here,
    * not an operator change). */
  val oracles: Map[String, String] = Map(
    "q41_multimodal_meta" ->
      s"""SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | upper(hex(encode(substring(text, 1, 4)))) AS magic,
        | CASE WHEN upper(hex(encode(substring(text, 1, 3)))) = 'FFD8FF' THEN 'jpeg'
        |      WHEN upper(hex(encode(substring(text, 1, 4)))) = '89504E47' THEN 'png'
        |      WHEN substring(text, 1, 4) = 'RIFF' THEN 'wav'
        |      ELSE 'bin' END AS kind,
        | ${Exact.sql.portableHash("text", 15)} AS content_hash
        |FROM documents ORDER BY 1""".stripMargin
  )

  /** STUB DECODER — deterministic fake standing in for a real codec
    * (no image/audio libs in this container). Emits a fixed-width
    * feature vector derived from payload bytes; replace with a real
    * decode + model forward pass without touching the plumbing. */
  private[graft] def fakeDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L // deterministic rolling hash over bytes
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var d = 0
    while (d < dim) {
      val x = h ^ (d * 0x9E3779B97F4A7C15L)
      val mixed = (x ^ (x >>> 33)) * 0xFF51AFD7ED558CCDL
      out(d) = ((mixed >>> 11).toDouble / (1L << 53).toDouble).toFloat
      d += 1
    }
    out
  }

  /** Partition-local feature extraction: batches stay on executors,
    * output is a fixed-width vector per payload — the Scala analog of a
    * pandas-batch UDF. `mapPartitions` is justified here (SURVEY.md §4):
    * decode is genuinely imperative per-row work, not relational. */
  def extractFeatures(payloads: Dataset[Payload], dim: Int = 16): Dataset[MediaFeature] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.map { p =>
        val f = fakeDecode(p.payload, dim)
        MediaFeature(p.doc_id, "bin", p.payload.length.toLong, f)
      }
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_multimodal_meta" -> (q41MultimodalMeta _)
  )
}
