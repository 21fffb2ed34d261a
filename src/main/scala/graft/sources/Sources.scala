package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Ingestion (SURVEY.md data model §3): schema-on-read loaders for the
  * formats the reference consumes (CSV call-detail records + labeled
  * user tables, pandas-read in data_process.py:53-57) and the parquet
  * lake format everything downstream uses.
  *
  * Scale rules encoded here:
  *  - ALWAYS an explicit schema. `inferSchema` double-scans the input —
  *    a non-starter on a 100 TB drop zone.
  *  - CDR timestamps parse with an explicit format, corrupt rows go to
  *    a quarantine column (PERMISSIVE + columnNameOfCorruptRecord)
  *    instead of killing a 10-hour job.
  *  - writes are partitioned by a low-cardinality time/key column so
  *    downstream scans prune partitions.
  */
object Sources {

  /** voc.csv shape: the call-detail-record log (reference Sichuan). */
  val cdrSchema: StructType = StructType(Seq(
    StructField("phone_no_m", StringType),
    StructField("opposite_no_m", StringType),
    StructField("calltype_id", IntegerType),
    StructField("start_datetime", TimestampType),
    StructField("call_dur", LongType),
    StructField("city_name", StringType),
    StructField("county_name", StringType),
    StructField("imei_m", StringType),
    StructField("_corrupt", StringType)))

  /** user.csv shape: the labeled account table. */
  val userSchema: StructType = StructType(Seq(
    StructField("phone_no_m", StringType),
    StructField("city_name", StringType),
    StructField("county_name", StringType),
    StructField("idcard_cnt", IntegerType),
    StructField("label", IntegerType),
    StructField("_corrupt", StringType)))

  /** CSV with explicit schema + quarantine for malformed rows. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      timestampFormat: String = "yyyy-MM-dd HH:mm:ss"): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("timestampFormat", timestampFormat)
      .csv(path)

  /** JSON-lines with explicit schema (same quarantine contract). */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Partitioned lake write: partition pruning is the first line of
    * defense at 100 TB — every downstream time/key filter skips files. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
}
