package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Test-scope overhead probe: per query, counts Spark jobs, stages and
  * total task time vs wall — at toy SF the gap between wall and
  * task-time is serial stage/scheduling overhead, which is the cost
  * model the stage-count optimizations target. NOT a correctness
  * artifact.
  *
  * Run: SPARK_GRAFT_SF_DIR=<dir> sbt "Test/runMain graft.ops.StageStats <key>..."
  */
object StageStats {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      sys.error("SPARK_GRAFT_SF_DIR is unset"))
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicLong(0)
    val stages = new AtomicLong(0)
    val tasks = new AtomicLong(0)
    val taskMs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null)
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
      }
    })
    val keys = if (args.nonEmpty) args.toSeq
      else Seq("q85_slice_feature_tensor", "q22_neighbor_avg_degree")
    keys.foreach { k0 =>
      val key = graft.SparkEntry.queries.keys
        .find(k => k == k0 || k.startsWith(k0 + "_")).getOrElse(sys.error(s"unknown $k0"))
      val fn = graft.SparkEntry.queries(key)
      // warmup
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache(); System.gc()
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      println(f"[stages] $key%-34s wall=$wall%6.2f s jobs=${jobs.get}%3d " +
        f"stages=${stages.get}%4d tasks=${tasks.get}%5d taskTime=${taskMs.get / 1000.0}%8.1f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
