package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

/** Regenerates [[Ann.q48Centroids]]: runs the MLlib IVF trainer (k=8,
  * seed 42, maxIter 10 — the exact q48 training recipe) on a testdata
  * directory and prints the centroids as the 6dp Scala literals the
  * frozen probe inlines. The 6dp quantization is what makes the frozen
  * table PORTABLE: both engines parse the same decimal text to the same
  * double, so the DECIMAL(18,9) scan quantization agrees bit-for-bit.
  *
  * Run: sbt "Test/runMain graft.ops.IvfFreeze [sfDir]"   (default sf0.01)
  */
object IvfFreeze {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    try {
      val feats = graft.Tables.embeddings(spark, dir).select(col("vec_id"),
        array_to_vector(col("embedding")).as("features"))
      val model = new KMeans().setK(8).setSeed(42L).setMaxIter(10).fit(feats)
      val rows = model.clusterCenters.zipWithIndex.map { case (c, i) =>
        s"    $i -> Array(" + c.toArray.map(v => f"$v%.6f").mkString(", ") + ")"
      }
      println("  // trained on " + dir)
      println(rows.mkString(",\n"))
    } finally spark.stop()
  }
}
