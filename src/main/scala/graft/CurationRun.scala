package graft

/** User-facing entry point for the corpus-curation workflow — the
  * training-data twin of [[PipelineRun]]: gates → dedup → keep-list →
  * decontaminate → pack → bucketed lake, printing the curation report
  * as one JSON line.
  *
  *   SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.CurationRun"
  */
object CurationRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val r = pipeline.CurationPipeline.run(spark, sfDir)
    val s = r.stats.head()
    val secs = (System.nanoTime() - t0) / 1e9
    val fields = s.schema.fieldNames
      .map(f => s""""$f":${s.getAs[Any](f)}""").mkString(",")
    println(s"""{"metric":"curation_pipeline","sf":"$sfDir","sec":$secs,$fields}""")
    spark.stop()
  }
}
