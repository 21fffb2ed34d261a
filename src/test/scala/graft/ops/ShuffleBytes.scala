package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import java.util.concurrent.atomic.AtomicLong

/** Test-scope shuffle-volume probe: runs a query to a noop sink with a
  * listener accumulating per-task shuffle WRITE bytes (read bytes mirror
  * them one stage later, so write volume is the single number that
  * captures what hits the shuffle disk — the resource the sf100
  * post-mortem identified as the single-box wall). Used for the
  * before/after A/B of the q85 day-partial packing; NOT a correctness
  * artifact.
  *
  * Run: SPARK_GRAFT_SF_DIR=<dir> sbt "Test/runMain graft.ops.ShuffleBytes [q85|q87]"
  */
object ShuffleBytes {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      sys.error("SPARK_GRAFT_SF_DIR is unset"))
    val which = args.headOption.getOrElse("q85")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val bytes = new AtomicLong(0)
    val records = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        }
      }
    })
    def q: DataFrame = which match {
      case "q85" => Features.q85Core(spark, dir)
      case "q87" => Features.q87PoolFrom(Features.q85Core(spark, dir))
      case other => sys.error(s"unknown query $other (q85|q87)")
    }
    val t0 = System.nanoTime()
    q.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    // listener events drain asynchronously after the job ends; the bus
    // is private, so give it a moment instead
    Thread.sleep(2000)
    println(f"""{"probe":"shuffle_bytes","query":"$which","sf":"$dir",""" +
      f""""shuffle_write_bytes":${bytes.get},"shuffle_write_records":${records.get},""" +
      f""""sec":$sec%.2f}""")
    spark.stop()
  }
}
