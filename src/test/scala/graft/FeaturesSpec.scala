package graft

import graft.ops.Features
import org.apache.spark.sql.functions.col

class FeaturesSpec extends SparkSpec {

  test("q10 multi-scale stats cover the 4 reference scales, n sums to 4x events") {
    val rows = Features.q10WindowedStats(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("scale")).distinct.sorted.toSeq == Seq(1, 2, 3, 4))
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n == 4 * Tables.events(spark, sf).count())
  }

  test("q11 shares per user are a probability distribution") {
    val rows = Features.q11EnergyDispersion(spark, sf).collect()
    // mean of shares * n_types == 1 for every user (shares sum to 1)
    rows.foreach { r =>
      val approx1 = r.getAs[Double]("mean_share") * r.getAs[Long]("n_types")
      assert(math.abs(approx1 - 1.0) < 1e-4, s"user ${r.get(0)}: $approx1")
    }
  }

  test("q12 hour shares sum to 1 per user") {
    val rows = Features.q12HourHistogram(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      val s = rs.map(_.getAs[Double]("share")).sum
      assert(math.abs(s - 1.0) < 1e-3, s"user $u share sum $s")
    }
  }

  test("q13 gaps are non-negative") {
    val rows = Features.q13TimeGaps(spark, sf).collect()
    rows.foreach { r =>
      if (!r.isNullAt(1)) assert(r.getAs[Double]("mean_gap") >= 0)
    }
  }

  test("q14 jaccard in [0,1]") {
    val rows = Features.q14RepeatRate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
    }
  }

  test("q15 recall rate in [0,1]") {
    val rows = Features.q15RecallRate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("recall_rate") >= 0.0 &&
      r.getAs[Double]("recall_rate") <= 1.0))
  }

  test("q17 z-scores have ~zero mean") {
    val rows = Features.q17ZScore(spark, sf).collect()
    val mean = rows.map(_.getAs[Double]("z")).sum / rows.length
    assert(math.abs(mean) < 1e-3)
  }

  test("q18 stratified split keeps both strata at ~80%") {
    val labeled = Tables.customer(spark, sf)
      .withColumn("label", (org.apache.spark.sql.functions.col("c_acctbal") < 0).cast("int"))
    val byLabel = labeled.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sampled = Features.q18StratifiedSplit(spark, sf).collect()
    val sampledByLabel = sampled.groupBy(_.getInt(1)).view.mapValues(_.length).toMap
    sampledByLabel.foreach { case (label, n) =>
      val frac = n.toDouble / byLabel(label)
      assert(frac > 0.5 && frac <= 1.0, s"label $label sampled frac $frac")
    }
  }

  test("q59 full matrix: q19 grain + all four graph slots, zero-filled") {
    val q19 = Features.q19FeatureMatrix(spark, sf)
    val full = Features.q59FullFeatureMatrix(spark, sf).cache()
    assert(full.count() == q19.count())
    for (c <- Seq("out_deg_signed", "in_deg_signed", "nbr_avg_deg", "clustering"))
      assert(full.filter(col(c).isNull).count() == 0, c)
    // at least one user carries a real (non-zero) graph feature
    assert(full.filter(col("out_deg_signed") > 0).count() > 0)
    assert(full.filter(col("nbr_avg_deg") > 0).count() > 0)
    full.unpersist()
  }

  test("q19 feature matrix is one row per active user") {
    val rows = Features.q19FeatureMatrix(spark, sf).collect()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.length == users)
  }
}
