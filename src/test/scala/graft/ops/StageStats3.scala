package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.concurrent.TrieMap

/** Stage metric split: run vs cpu vs gc vs deser (test-scope probe). */
object StageStats3 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", sys.error("SPARK_GRAFT_SF_DIR unset"))
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val stages = TrieMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        stages.put(s.stageInfo.stageId,
          f"run=${m.executorRunTime / 1000.0}%7.1f cpu=${m.executorCpuTime / 1e9}%7.1f " +
          f"gc=${m.jvmGCTime / 1000.0}%6.1f deser=${m.executorDeserializeTime / 1000.0}%6.1f " +
          f"tasks=${s.stageInfo.numTasks}%4d in=${m.inputMetrics.bytesRead / 1e6}%8.1f MB " +
          f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.1f MB " +
          f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%7.1f MB")
      }
    })
    val k0 = args.headOption.getOrElse("q85")
    val key = graft.SparkEntry.queries.keys
      .find(k => k == k0 || k.startsWith(k0 + "_")).getOrElse(sys.error(s"unknown $k0"))
    val fn = graft.SparkEntry.queries(key)
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache(); System.gc(); stages.clear()
    val t0 = System.nanoTime()
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    println(f"[wall] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(1500)
    stages.toSeq.sortBy(_._1).foreach { case (id, s) => println(f"[stage $id%4d] $s") }
    spark.stop()
  }
}
