package graft

/** User-facing entry point for the flagship workflow: run the full
  * reference pipeline (32-slot feature matrix → stratified split → LR
  * train → held-out test_model metric suite) against a scale-factor
  * directory and print the metric row as one JSON line — what a user
  * of the reference would invoke instead of `python main.py`.
  *
  *   SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.PipelineRun"
  */
object PipelineRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args.filterNot(_.startsWith("--")).headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    // `--extended` joins in the beyond-parity feature tier (PageRank,
    // k-core, EWMA burst) — see FraudPipeline.run and the README A/B
    val extended = args.contains("--extended") ||
      sys.env.get("SPARK_GRAFT_EXTENDED").contains("1")
    // `--slices` trains on the flattened q85 dynamic tensor as well —
    // the reference model's four stacked time-scale inputs
    val slices = args.contains("--slices") ||
      sys.env.get("SPARK_GRAFT_SLICES").contains("1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val r = pipeline.FraudPipeline.run(spark, sfDir,
      extendedFeatures = extended, sliceFeatures = slices)
    val m = r.metrics.head()
    val secs = (System.nanoTime() - t0) / 1e9
    val fields = m.schema.fieldNames
      .map(f => s""""$f":${m.getAs[Any](f)}""").mkString(",")
    println(s"""{"metric":"fraud_pipeline","sf":"$sfDir","sec":$secs,""" +
      s""""extended":$extended,"slices":$slices,""" +
      s""""n_users":${r.features.count()},"n_scored":${r.scored.count()},$fields}""")
    spark.stop()
  }
}
