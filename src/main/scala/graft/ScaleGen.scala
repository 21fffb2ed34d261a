package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale replication of a testdata directory: writes a
  * K× larger copy built from K key-shifted replicas of every fact table
  * (dimensions `region`/`nation` stay single — they are genuinely fixed
  * cardinality). Used for the sf1-equivalent scale validation
  * (SURVEY.md §7.18): the oracle gate and the bench run against the
  * replica directory exactly as they do against the driver testdata.
  *
  * Replication is designed to preserve each operator's per-key work
  * profile instead of adversarially inflating it — the way a truly
  * larger dataset would behave:
  *  - every entity key (custkey, orderkey, user_id, doc_id, vec_id, …)
  *    shifts by `replica × 10⁷`, so replicas are disjoint and every
  *    equi-join stays within its replica (the graph becomes K disjoint
  *    copies, exactly like K new cohorts of users);
  *  - document text gets a per-replica token SUFFIX on every word
  *    (replica 0 keeps the original bytes): within-replica dup/near-dup
  *    structure is preserved, but replicas share no shingles — document
  *    frequency per shingle stays flat as the corpus grows, which is
  *    how real crawl growth behaves (identical copies would instead
  *    multiply every df by K and blow the pair join up K²);
  *  - embeddings cyclically rotate by `replica` positions: norms and
  *    all within-replica cosines are bit-preserved (so per-cell ANN
  *    candidate counts scale linearly), while cross-replica similarity
  *    decorrelates;
  *  - `events.ts` is TIMESTAMP(NANOS) in the source, which Spark cannot
  *    write back; the replica stores the raw nanos as plain INT64 —
  *    [[Tables.events]] reads either encoding identically, and the
  *    oracle harness rebuilds a timestamp view for DuckDB.
  */
object ScaleGen {

  private val stride = 10L * 1000 * 1000

  def main(args: Array[String]): Unit = {
    // loud usage instead of a bare MatchError, like the other two mains
    require(args.length == 3 && args(2).forall(_.isDigit),
      "usage: sbt \"runMain graft.ScaleGen <srcDir> <outDir> <k>\" " +
        "(k an integer in 1..100)")
    val Array(srcDir, outDir, kStr) = args
    val k = kStr.toInt
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, srcDir, outDir, k)
    finally spark.stop()
  }

  /** Session-lifecycle-free body, callable from specs against a shared
    * session. Restores the nanos-read conf it flips. */
  private[graft] def run(spark: SparkSession, srcDir: String, outDir: String,
      k: Int): Unit = {
    require(k >= 1 && k <= 100, "replication factor out of range")
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    val nanosPrev = spark.conf.getOption(nanosKey)
    try {
      copy(spark, srcDir, outDir, "region")
      copy(spark, srcDir, outDir, "nation")
      write(outDir, "customer", replicate(Tables.customer(spark, srcDir), k, "c_custkey"))
      write(outDir, "supplier", replicate(Tables.supplier(spark, srcDir), k, "s_suppkey"))
      write(outDir, "part", replicate(Tables.part(spark, srcDir), k, "p_partkey"))
      write(outDir, "orders",
        replicate(Tables.orders(spark, srcDir), k, "o_orderkey", "o_custkey"))
      write(outDir, "lineitem",
        replicate(Tables.lineitem(spark, srcDir), k, "l_orderkey", "l_partkey", "l_suppkey"))
      // events: raw read keeps ts as nanos-long (no truncation — the
      // replica must preserve source precision end-to-end)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // props carries the peer/area id consumed by q16/q53/q59 — shift
      // it with the same replica stride as the explicit key columns or
      // every replica's call edges would point at the base replica's
      // peers (a k-fold hub blowup instead of k disjoint cohorts).
      // The rewrite rebuilds props as {"k": N}: a row whose props lacks
      // k would null the whole column and any extra JSON field would be
      // silently dropped, so props.k passes the SAME loud stride guard
      // as the explicit key columns before the rewrite runs.
      val srcEvents = Tables(spark, srcDir, "events")
      val kStats = srcEvents.agg(
        max(get_json_object(col("props"), "$.k").cast("long")),
        count(lit(1)),
        count(get_json_object(col("props"), "$.k").cast("long"))).head()
      require(!kStats.isNullAt(0) && kStats.getLong(0) < stride,
        s"events props.k max ${kStats.get(0)} >= replica stride $stride — keys would collide")
      require(kStats.getLong(1) == kStats.getLong(2),
        s"${kStats.getLong(1) - kStats.getLong(2)} events rows lack a numeric props.k — " +
          "the {\"k\": N} props rewrite would null them; extend the rewrite first")
      write(outDir, "events",
        replicate(srcEvents, k, "event_id", "user_id")
          .withColumn("props",
            concat(lit("{\"k\": "),
              (get_json_object(col("props"), "$.k").cast("long")
                + col("_rep").cast("long") * stride).cast("string"),
              lit("}"))))
      write(outDir, "documents",
        replicate(Tables.documents(spark, srcDir), k, "doc_id")
          .withColumn("text",
            when(col("_rep") === 0, col("text"))
              .otherwise(concat(
                regexp_replace(col("text"), lit(" "),
                  concat(lit("_r"), col("_rep"), lit(" "))),
                lit("_r"), col("_rep"))))
          .withColumn("n_chars", length(col("text")).cast("long")))
      // rotation offset wraps at the vector dim: _rep itself would send
      // `size - _rep` negative once k exceeds the dim (slice errors)
      write(outDir, "embeddings",
        replicate(Tables.embeddings(spark, srcDir), k, "vec_id")
          .withColumn("_rot", pmod(col("_rep"), size(col("embedding"))))
          .withColumn("embedding",
            when(col("_rot") === 0, col("embedding"))
              .otherwise(concat(
                slice(col("embedding"), col("_rot") + 1,
                  size(col("embedding")) - col("_rot")),
                slice(col("embedding"), lit(1), col("_rot")))))
          .drop("_rot"))
      println(s"[scalegen] wrote ${k}x replica of $srcDir to $outDir")
    } finally nanosPrev match {
      case Some(v) => spark.conf.set(nanosKey, v)
      case None => spark.conf.unset(nanosKey)
    }
  }

  /** K replicas with each listed key column shifted by replica·stride.
    * Keeps a `_rep` column for table-specific transforms; [[write]]
    * drops it. Every key column must fit below the stride — a source
    * whose keys already exceed it (a bigger SF, or a previous ScaleGen
    * output) would silently collide replica r's shifted keys with
    * replica 0's native ones, corrupting every join in the benchmark,
    * so that is a loud error, not a wrong answer. */
  private def replicate(df: DataFrame, k: Int, keyCols: String*): DataFrame = {
    keyCols.foreach { c =>
      val mx = Option(df.agg(max(col(c))).head().get(0))
        .map(_.toString.toLong).getOrElse(0L)
      require(mx < stride,
        s"key column $c max $mx >= replica stride $stride — keys would collide")
    }
    val shifted = keyCols.foldLeft(
      df.withColumn("_rep", explode(array((0 until k).map(lit): _*)))) {
      (d, c) => d.withColumn(c, col(c) + col("_rep").cast("long") * stride)
    }
    shifted
  }

  /** Replica output must look like real lake data: many splittable
    * files. The source testdata is one file with ONE 10M-row row group —
    * unsplittable, so every downstream scan of a large replica ran as a
    * single task (measured: the q85 sf10 cache build spent 55 s in one
    * scan thread). Fan the k-replica explode out to bounded file counts
    * and cap the parquet row-group size so even a single file stays
    * row-group-splittable. */
  private def write(outDir: String, name: String, df: DataFrame,
      parts: Option[Int] = None): Unit = {
    val n = parts.getOrElse(df.sparkSession.sparkContext.defaultParallelism)
    df.drop("_rep")
      .repartition(n)
      .write.mode("overwrite")
      .option("parquet.block.size", 32L * 1024 * 1024)
      .parquet(s"$outDir/$name.parquet")
  }

  private def copy(spark: SparkSession, srcDir: String, outDir: String,
      name: String): Unit =
    write(outDir, name, Tables(spark, srcDir, name), parts = Some(1))
}
