package graft
import org.apache.spark.sql.SparkSession
object Prof {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    t("q29")(ops.Metrics.q29MllibPipeline(spark, sf).count())
    t("q29 again")(ops.Metrics.q29MllibPipeline(spark, sf).count())
    spark.stop()
  }
}
