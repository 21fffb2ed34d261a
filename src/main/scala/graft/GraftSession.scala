package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession factory — the engine's recommended configuration
  * at both test scale (local[N]) and cluster scale.
  *
  * Settings and why (SURVEY.md §5):
  *  - AQE on with skew-join handling: runtime re-plan replaces manual
  *    salting for moderately skewed keys (hot users/suppliers).
  *  - shuffle.partitions sized to cores locally; at cluster scale the
  *    caller passes ~2-3× total cores.
  *  - partition coalescing keeps small post-filter shuffles from
  *    fragmenting into thousands of empty tasks.
  *  - UTC session timezone: oracle comparisons and date_trunc semantics
  *    must not depend on host zone.
  */
object GraftSession {

  def local(cores: Int): SparkSession = build(s"local[$cores]", cores)

  def build(master: String, shufflePartitions: Int): SparkSession = {
    val base = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      // engine contract: TIMESTAMP(NANOS) parquet reads as raw ns longs
      // (Tables.events truncates to µs); set once here, not per-read
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // Tuning-sweep overrides (SURVEY §7.19): semicolon-separated k=v
    // pairs, applied last so a sweep can flip AQE/partition settings
    // without a code edit, e.g.
    // SPARK_GRAFT_CONF="spark.sql.adaptive.enabled=false;spark.sql.shuffle.partitions=128"
    val tuned = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .foldLeft(base) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2)
        b.config(k, v)
      }
    tuned.getOrCreate()
  }
}
