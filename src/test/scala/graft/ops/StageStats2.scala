package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.concurrent.TrieMap

/** Per-stage task-time attribution for one query (test-scope probe). */
object StageStats2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", sys.error("SPARK_GRAFT_SF_DIR unset"))
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val stages = TrieMap[Int, (String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val info = s.stageInfo
        val ms = info.taskMetrics.executorRunTime
        stages.put(info.stageId, (info.name.take(90), ms, info.numTasks))
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
    stages.toSeq.sortBy(-_._2._2).take(25).foreach { case (id, (name, ms, nt)) =>
      println(f"[stage $id%4d] ${ms / 1000.0}%8.1f s  tasks=$nt%4d  $name")
    }
    spark.stop()
  }
}
