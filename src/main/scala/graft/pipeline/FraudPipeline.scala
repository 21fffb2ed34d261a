package graft.pipeline

import graft.{ops, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's end-to-end Sichuan workflow as ONE composable call
  * (Code for Sichuan: data_process.py main → feature tensors → GNN
  * train → test_model metrics):
  *
  *   CDR log → per-user feature matrix (q19's 32-wide slice_feature)
  *           → label join → deterministic stratified split (q18 hash)
  *           → MLlib LogisticRegression on the assembled vector
  *           → held-out confusion / accuracy metrics
  *
  * Everything upstream of the model is a declarative Catalyst plan —
  * a user of the reference runs `FraudPipeline.run(spark, dir)` and
  * gets the same artifacts the Python pipeline produces, distributed.
  */
object FraudPipeline {

  case class Result(features: DataFrame, scored: DataFrame, metrics: DataFrame)

  def run(spark: SparkSession, dir: String): Result = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler

    // 1. feature matrix per user (the reference's slice_feature)
    val features = ops.Features.q19FeatureMatrix(spark, dir)

    // 2. labels from the account table (user_id keys into customer)
    val labeled = features.join(
      Tables.customer(spark, dir).select(
        col("c_custkey").as("user_id"),
        (col("c_acctbal") < 0).cast("double").as("label")),
      "user_id")

    // 3. reproducible stratified 80/20 split (same LCG hash as q18)
    val withSplit = labeled.withColumn("is_train",
      ops.Exact.lcgTrain80("user_id"))

    // 4. assemble + train on the train fold only
    val featCols = features.columns.filterNot(_ == "user_id")
    val assembler = new VectorAssembler()
      .setInputCols(featCols).setOutputCol("fvec").setHandleInvalid("keep")
    val assembled = assembler.transform(withSplit).cache()
    val model = new LogisticRegression()
      .setFeaturesCol("fvec").setLabelCol("label")
      .setMaxIter(20).setRegParam(0.01)
      .fit(assembled.filter(col("is_train")))
    assembled.unpersist() // scoring below is a single pass; don't leak

    // 5. score the held-out fold, compute the reference's metric suite
    val scored = model.transform(assembled.filter(!col("is_train")))
      .select(col("user_id"), col("label").cast("int").as("y"),
        col("prediction").cast("int").as("pred"))
    val metrics = scored.agg(
      sum(when(col("y") === 1 && col("pred") === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(col("y") === 0 && col("pred") === 1, 1L).otherwise(0L)).as("fp"),
      sum(when(col("y") === 0 && col("pred") === 0, 1L).otherwise(0L)).as("tn"),
      sum(when(col("y") === 1 && col("pred") === 0, 1L).otherwise(0L)).as("fn"))
      .withColumn("accuracy",
        (col("tp") + col("tn")) * lit(1.0) /
          (col("tp") + col("fp") + col("tn") + col("fn")))
    Result(features, scored, metrics)
  }
}
