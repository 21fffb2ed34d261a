package graft
import org.apache.spark.sql.SparkSession
object Prof {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    t("q36")(ops.Ann.q36DedupEmbedding(spark, sf).count())
    t("q34")(ops.Ann.q34AnnCosineTopk(spark, sf).count())
    t("q35")(ops.Ann.q35AnnLsh(spark, sf).count())
    t("q40")(ops.Text.q40Fingerprint(spark, sf).count())
    t("q31")(ops.Text.q31DedupNgramJaccard(spark, sf).count())
    t("q32")(ops.Dedup.q32DedupMinhash(spark, sf).count())
    spark.stop()
  }
}
