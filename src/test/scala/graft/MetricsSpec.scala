package graft

/** Semantic invariants for the metric operators (SURVEY.md §2.D). */
class MetricsSpec extends SparkSpec {

  test("q26 confusion counts partition the dataset") {
    val r = ops.Metrics.q26ConfusionMetrics(spark, sf).head()
    val total = r.getLong(0) + r.getLong(1) + r.getLong(2) + r.getLong(3)
    assert(total == Tables.embeddings(spark, sf).count())
    val acc = r.getDouble(4)
    assert(acc >= 0.0 && acc <= 1.0)
  }

  test("q27 AUC in [0,1] and pos/neg counts sum to n") {
    val r = ops.Metrics.q27RocAuc(spark, sf).head()
    val auc = r.getDouble(0)
    assert(auc >= 0.0 && auc <= 1.0)
    assert(r.getLong(1) + r.getLong(2) == Tables.embeddings(spark, sf).count())
  }

  test("q28 average precision >= prevalence baseline sanity") {
    val r = ops.Metrics.q28AvgPrecision(spark, sf).head()
    val ap = r.getDouble(0)
    assert(ap > 0.0 && ap <= 1.0)
  }

  test("q29 MLlib logistic regression scores every vector") {
    val df = ops.Metrics.q29MllibPipeline(spark, sf)
    assert(df.count() == Tables.embeddings(spark, sf).count())
    // separable synthetic clusters: the model must beat majority-class
    val agree = df.filter("y = pred").count().toDouble / df.count()
    assert(agree > 0.85, s"train accuracy $agree")
  }

  test("q54 MLP scores every vector and beats majority-class") {
    val df = ops.Metrics.q54MlpPipeline(spark, sf)
    assert(df.count() == Tables.embeddings(spark, sf).count())
    val agree = df.filter("y = pred").count().toDouble / df.count()
    assert(agree > 0.85, s"train accuracy $agree")
  }
}
