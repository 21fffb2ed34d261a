package graft

import org.apache.spark.sql.execution.FormattedMode

/** Bucketed layout: joins on the bucket key must be exchange-free. */
class LakeSpec extends SparkSpec {

  private def scrub(tables: String*): Unit = tables.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new java.io.File(s"spark-warehouse/$t")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(loc)
    }
  }

  test("bucketed tables join without a shuffle") {
    scrub("b_orders", "b_lineitem")
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    sources.Lake.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    sources.Lake.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    // force the shuffle-join path: at test scale the planner would
    // broadcast instead, which never exercises bucket co-location
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = sources.Lake.colocatedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.explainString(FormattedMode)
      assert(plan.contains("Bucketed: true"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() == Tables.lineitem(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      scrub("b_orders", "b_lineitem")
    }
  }
}
