package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-pass distributed global-ordering primitive.
  *
  * A window with `ORDER BY` and no `PARTITION BY` executes as ONE task
  * (Spark plans `Exchange SinglePartition`) — fine at sf0.1, a straggler
  * at billions of rows. The classic scale-safe replacement (same trick
  * as `RDD.zipWithIndex`) is two passes:
  *
  *  1. bucket rows by a range function that is monotone in the sort key
  *     (so bucket order == global order and ties never straddle buckets),
  *  2. aggregate per-bucket totals — a tiny table, ≤ `buckets` rows —
  *     fold it into exclusive prefix offsets on the driver, and
  *  3. run the window PARTITIONED BY bucket (parallel) adding the
  *     bucket's offset to each local rank / running sum.
  *
  * The driver-side fold is over at most `buckets` aggregated rows — a
  * fixed-size metadata collect, not a data collect. Results are
  * bit-identical to the single-partition window: ranks and prefix sums
  * are exact integers either way.
  */
object Ranking {

  val defaultBuckets = 1024

  /** Adds `_b` ∈ [0, buckets): an equi-width range bucket of `score`,
    * ascending (or descending) monotone, computed from one min/max
    * aggregate pass. Equal scores always share a bucket, so order-by
    * ties never cross bucket boundaries. Degenerate case (all scores
    * equal) collapses to a single bucket, which is still correct. */
  def withRangeBucket(df: DataFrame, score: String,
                      descending: Boolean,
                      buckets: Int = defaultBuckets): DataFrame = {
    val r = df.agg(min(col(score)).cast("double"), max(col(score)).cast("double")).head()
    // empty input (or all-null scores) ⇒ min/max are NULL — collapse to
    // the degenerate single-bucket case instead of throwing
    val (mn, mx) =
      if (r.isNullAt(0) || r.isNullAt(1)) (0.0, 0.0)
      else (r.getDouble(0), r.getDouble(1))
    val width = mx - mn
    val raw =
      if (width == 0) lit(0)
      else if (descending) floor((lit(mx) - col(score)) / lit(width) * buckets)
      else floor((col(score) - lit(mn)) / lit(width) * buckets)
    df.withColumn("_b", least(greatest(raw.cast("int"), lit(0)), lit(buckets - 1)))
  }

  /** For each requested aggregate, the EXCLUSIVE prefix total of all
    * buckets strictly before a row's `_b`, as a lookup column (a
    * broadcast-able map literal keyed by `_b`). `sums` values must be
    * long-valued aggregates (count/sum of integers). */
  def exclusiveOffsets(bucketed: DataFrame, sums: Map[String, Column]): Map[String, Column] = {
    val names = sums.keys.toSeq
    val perBucket = bucketed.groupBy(col("_b"))
      .agg(sums(names.head).as(names.head),
        names.tail.map(n => sums(n).as(n)): _*)
      .collect()
      .sortBy(_.getAs[Int]("_b"))
    names.map { n =>
      var acc = 0L
      val pairs = perBucket.map { row =>
        val v = acc
        acc += row.getAs[Long](n)
        (row.getAs[Int]("_b"), v)
      }
      n -> element_at(typedLit(pairs.toMap), col("_b"))
    }.toMap
  }

  /** GROUPED variant of [[exclusiveOffsets]]: the exclusive prefix
    * total accumulates within each `groupCol` value, so a window
    * PARTITIONED BY (group, _b) plus this offset reproduces the
    * per-group global rank bit-for-bit. For LOW-cardinality group keys
    * (a handful of distinct values), `PARTITION BY group` alone is the
    * skew hazard — each group is one task sorting its whole slice of
    * the data; bucketing restores parallelism while the metadata
    * collect stays ≤ groups × buckets aggregated rows. */
  def exclusiveOffsetsBy(bucketed: DataFrame, groupCol: String,
      sums: Map[String, Column]): Map[String, Column] = {
    val names = sums.keys.toSeq
    val perBucket = bucketed.groupBy(col(groupCol), col("_b"))
      .agg(sums(names.head).as(names.head),
        names.tail.map(n => sums(n).as(n)): _*)
      .collect()
      .groupBy(_.getAs[Any](groupCol).toString)
    val key = concat(col(groupCol).cast("string"), lit(":"), col("_b").cast("string"))
    names.map { n =>
      val pairs = perBucket.toSeq.flatMap { case (g, rows) =>
        var acc = 0L
        rows.sortBy(_.getAs[Int]("_b")).map { row =>
          val v = acc
          acc += row.getAs[Long](n)
          (s"$g:${row.getAs[Int]("_b")}", v)
        }
      }
      n -> element_at(typedLit(pairs.toMap), key)
    }.toMap
  }
}
