package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling (SURVEY.md §5) for when AQE's runtime skew
  * split isn't available (pre-AQE clusters, streaming joins) or when a
  * single key dwarfs everything (the CDR "call-center number" problem —
  * one callee with millions of callers).
  *
  * `saltedJoin` spreads each hot key of the LEFT (large, skewed) side
  * over `salt` shuffle partitions and replicates the RIGHT side once per
  * salt bucket — turning one straggler task into `salt` even tasks.
  * Correctness is unchanged: every (l, r) key match meets in exactly one
  * salt bucket, because the left row's bucket is a function of the row
  * and the right row is present in all buckets.
  */
object Skew {

  /** Equi-join `left ⋈ right` on `key`, salting the left side.
    *
    * @param salt number of buckets to spread each key over (≥ 1)
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    // right/full outer would emit `salt` null-padded copies of unmatched
    // replicated right rows — only left-preserving types are sound
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left-preserving join types, got $joinType")
    // DETERMINISTIC salt: hash of the whole left row. Task retries must
    // re-derive the same bucket (nondeterministic salts corrupt joins
    // when a lost shuffle map output is recomputed — SPARK-23207 class);
    // identical duplicate rows sharing a bucket only costs balance.
    val lSalted = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(salt)).cast("int"))
    val rReplicated = right.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    lSalted.join(rReplicated,
        lSalted(key) === rReplicated(key) &&
          lSalted("__salt") === rReplicated("__salt"),
        joinType)
      .drop(rReplicated(key)).drop(lSalted("__salt")).drop(rReplicated("__salt"))
  }

  /** Top-N heaviest keys of a column — the diagnosis step before
    * choosing a salt factor (run it on a sample at 100 TB). */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(topN)
}
