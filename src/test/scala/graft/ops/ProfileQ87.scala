package graft.ops

import org.apache.spark.sql.DataFrame

/** Throwaway component profiler for q87 — splits the temporal-attention
  * pool's cost between its q85 tensor input, the scoring window stage
  * (gate + softmax over (user_id, scale)) and the pooling aggregate,
  * using the SAME private[graft] builders the production query composes
  * ([[Features.q85Core]], [[Features.q87Scored]], [[Features.q87PoolFrom]])
  * so the profile can never desynchronize from the real spelling. NOT a
  * correctness artifact — insurance so a future "optimize the softmax
  * exchange" idea starts from where the time actually is.
  *
  * The tensor-stage components (B/C) first materialize the q85 tensor to
  * a parquet temp table and time ONLY the pool stage over it, isolating
  * it from the (dominant) q85 build.
  *
  * Run: SPARK_GRAFT_SF_DIR=target/sf1 sbt "Test/runMain graft.ops.ProfileQ87"
  */
object ProfileQ87 {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      sys.error("SPARK_GRAFT_SF_DIR is unset — point it at a testdata " +
        "scale-factor directory, e.g. SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1"))
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")

    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => DataFrame): Unit = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      mat(f)
      println(f"[profile] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    time("full_q87")(Features.q87PoolFrom(Features.q85Core(spark, dir)))
    time("A_q85_tensor")(Features.q85Core(spark, dir))

    // isolate the pool: tensor goes to disk once, stages read it back
    val tensorPath = java.nio.file.Files
      .createTempDirectory("q87_tensor").toAbsolutePath.toString
    Features.q85Core(spark, dir).write.mode("overwrite").parquet(tensorPath)
    def tensor = spark.read.parquet(tensorPath)
    time("B_score_softmax")(Features.q87Scored(tensor))
    time("C_pool_full")(Features.q87PoolFrom(tensor))
    time("B_score_softmax2")(Features.q87Scored(tensor))
    time("C_pool_full2")(Features.q87PoolFrom(tensor))
    time("full_q87_again")(Features.q87PoolFrom(Features.q85Core(spark, dir)))
    spark.stop()
  }
}
