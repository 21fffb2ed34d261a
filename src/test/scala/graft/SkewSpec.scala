package graft

import org.apache.spark.sql.functions._

/** saltedJoin correctness: same result as a plain join, spread tasks. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on a skewed key") {
    // left: one hot key (90% of rows) + tail
    val left = (1 to 2000).map(i => (if (i <= 1800) 1L else i.toLong, i))
      .toDF("k", "lv")
    val right = (1 to 300).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, "k").select("k", "lv", "rv")
    val salted = ops.Skew.saltedJoin(left, right, "k", salt = 8)
      .select("k", "lv", "rv")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin left_outer keeps unmatched rows exactly once") {
    val left = Seq((1L, "a"), (2L, "b"), (99L, "zz")).toDF("k", "lv")
    val right = Seq((1L, "x"), (2L, "y")).toDF("k", "rv")
    val out = ops.Skew.saltedJoin(left, right, "k", salt = 4, "left_outer")
    assert(out.count() == 3)
    assert(out.filter(col("rv").isNull).count() == 1)
  }

  test("keyHistogram surfaces the hot key first") {
    val df = (1 to 100).map(i => (if (i <= 60) 7L else i.toLong, i)).toDF("k", "v")
    val top = ops.Skew.keyHistogram(df, "k", 3).head()
    assert(top.getLong(0) == 7L && top.getLong(1) == 60L)
  }
}
