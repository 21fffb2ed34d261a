package graft

import org.apache.spark.sql.functions._

/** End-to-end pipeline: features → split → train → held-out metrics. */
class PipelineSpec extends SparkSpec {

  test("FraudPipeline runs end-to-end with a coherent held-out fold") {
    val r = pipeline.FraudPipeline.run(spark, sf)
    val nUsers = r.features.count()
    assert(nUsers > 0)
    assert(r.features.columns.length == 32) // user_id + 31 features
    val m = r.metrics.head()
    val total = m.getLong(0) + m.getLong(1) + m.getLong(2) + m.getLong(3)
    // held-out fold ≈ 20% of labeled users
    assert(total == r.scored.count())
    assert(total > 0 && total < nUsers)
    val acc = m.getAs[Double]("accuracy")
    assert(acc >= 0.0 && acc <= 1.0)
  }

  test("pipeline split is reproducible") {
    val a = pipeline.FraudPipeline.run(spark, sf).scored
      .select("user_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = pipeline.FraudPipeline.run(spark, sf).scored
      .select("user_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }
}
