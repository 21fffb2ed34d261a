package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Sources, session-extension, and q43 specs. */
class SourcesSpec extends SparkSpec {

  test("csv ingestion: explicit schema, corrupt rows quarantined") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "voc.csv")
    val w = new java.io.PrintWriter(f)
    w.println("phone_no_m,opposite_no_m,calltype_id,start_datetime,call_dur,city_name,county_name,imei_m")
    w.println("u1,u2,1,2020-01-01 10:00:00,60,c,k,i")
    w.println("u3,u4,not_an_int,garbage,xx,c,k,i")
    w.close()
    val df = sources.Sources.csv(spark, f.getPath, sources.Sources.cdrSchema)
    val rows = df.collect()
    assert(rows.length == 2)
    val good = rows.find(_.getAs[String]("phone_no_m") == "u1").get
    assert(good.getAs[Long]("call_dur") == 60L)
    assert(good.getAs[String]("_corrupt") == null)
    val bad = rows.find(_.getAs[String]("_corrupt") != null)
    assert(bad.isDefined, "malformed row should be quarantined, not dropped")
  }

  test("partitioned write produces prunable layout") {
    val out = Files.createTempDirectory("graft_lake").toFile.getPath + "/events"
    val ev = Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    sources.Sources.writePartitioned(ev, out, Seq("day"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("day=")), dirs.mkString(","))
    val back = sources.Sources.parquet(spark, out)
    assert(back.count() == ev.count())
    // partition filter must prune, not scan-and-filter
    val day = dirs.head.stripPrefix("day=")
    val plan = back.filter(col("day") === day).queryExecution.executedPlan.toString
    assert(!plan.contains("PushedFilters: [IsNotNull(day)"), "partition col should prune, not filter")
  }

  test("dot_long is registered as a SQL function via GraftExtensions") {
    // SparkSpec's session is built by GraftSession → extensions active
    val r = spark.sql("SELECT dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").head()
    assert(r.getLong(0) == 32L)
  }

  test("q43 col-normalized weights average to 1 per dst") {
    val bad = ops.Graph.q43ColNormalizeAdj(spark, sf)
      .groupBy("dst").agg(avg("norm_w").as("m"))
      .filter(abs(col("m") - 1.0) > 1e-3).count()
    assert(bad == 0)
  }
}
