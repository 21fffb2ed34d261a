package graft

import graft.ops.Relational

class RelationalSpec extends SparkSpec {

  test("q01 aggregates lineitem by flag/status") {
    val rows = Relational.q01Agg(spark, sf).collect()
    assert(rows.nonEmpty)
    val schema = rows.head.schema.fieldNames.toSeq
    assert(schema == Seq("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
      "sum_disc_price", "avg_qty", "avg_disc", "count_order"))
    // counts sum to the filtered row count
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total > 0 && total <= Tables.lineitem(spark, sf).count())
  }

  test("q02 returns a single filtered aggregate row") {
    val rows = Relational.q02FilterProject(spark, sf).collect()
    assert(rows.length == 1)
  }

  test("q03 join agg has revenue per segment-year") {
    val rows = Relational.q03JoinAgg(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("q04 broadcast star join plan uses broadcast joins") {
    val df = Relational.q04BroadcastJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
    assert(df.collect().nonEmpty)
  }

  test("q05 rank keeps at most 3 per customer, ties included") {
    val rows = Relational.q05WindowRank(spark, sf).collect()
    assert(rows.forall(r => r.getAs[Long]("rnk") >= 1 && r.getAs[Long]("rnk") <= 3))
  }

  test("q06 semi+anti partition the customer set") {
    val rows = Relational.q06SemiAnti(spark, sf).collect()
    val byKind = rows.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    val nCust = Tables.customer(spark, sf).count()
    assert(byKind.values.sum == nCust)
    // each custkey appears exactly once
    assert(rows.map(_.getLong(1)).distinct.length == nCust)
  }

  test("q07 distinct counts bounded by table cardinalities") {
    val rows = Relational.q07DistinctCount(spark, sf).collect()
    val nParts = Tables.part(spark, sf).count()
    assert(rows.forall(_.getAs[Long]("n_parts") <= nParts))
  }

  test("q08 rollup grand total equals customer count") {
    val rows = Relational.q08Rollup(spark, sf).collect()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n") == Tables.customer(spark, sf).count())
  }

  test("q09 pivot hour histogram sums to event count") {
    val rows = Relational.q09Pivot(spark, sf).collect()
    val total = rows.flatMap(r => (1 until r.length).map(r.getLong)).sum
    assert(total == Tables.events(spark, sf).count())
  }

  test("q02 filter is pushed down to the parquet scan") {
    val df = Relational.q02FilterProject(spark, sf)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("PushedFilters"), formatted)
  }

  test("q07 companion: approx_count_distinct tracks exact within 10%") {
    import org.apache.spark.sql.functions._
    val r = Tables.lineitem(spark, sf).agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).head()
    val (e, a) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(e - a) / e < 0.10, s"exact $e approx $a")
  }

  test("q76 HLL estimate within the sketch's error bound; exact side truly exact") {
    val rows = Relational.q76HllDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // m=256 → standard error 1.04/√256 ≈ 6.5%; 3σ guard
      assert(r.getAs[Double]("rel_err") < 0.20,
        s"${r.getString(0)}: rel_err ${r.getAs[Double]("rel_err")}")
    }
    // the exact column must equal an independent countDistinct
    import org.apache.spark.sql.functions._
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == exact(r.getString(0))))
  }

  test("q84 Count-Min: estimates dominate exact counts; absent key isolates collision mass") {
    val rows = ops.Relational.q84CountMin(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.size == 21)
    // the CMS guarantee: estimate >= exact, always
    rows.foreach { case (u, (exact, est, over)) =>
      assert(est >= exact, s"user $u: est $est < exact $exact")
      assert(over == est - exact)
    }
    // the absent key's estimate is PURE collision mass
    assert(rows(-1L)._1 == 0L)
    // exact side agrees with an independent count
    import org.apache.spark.sql.functions._
    val exact = Tables.events(spark, sf)
      .filter(col("user_id").between(1L, 20L))
      .groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 20L).foreach { u =>
      assert(rows(u)._1 == exact.getOrElse(u, 0L), s"user $u exact")
    }
  }

  test("q76 linear-counting branch: small cardinalities hit the m·ln(m/V) correction") {
    import spark.implicits._
    val n = 50
    val pairs = (1 to n).map(i => ("tiny", s"v$i")).toDF("g", "x")
    val r = ops.Relational.hllDistinct(pairs).head()
    assert(r.getLong(1) == n.toLong)
    // with 50 hashes over 256 registers the raw estimate is far below
    // 2.5m, so the emitted value must be the linear-counting form for
    // the OBSERVED number of empty registers (replay it driver-side)
    val est = r.getAs[Double]("hll_est")
    val candidates = (256 - n to 255).map(v =>
      math.floor(256.0 * StrictMath.log(256.0 / v) * 1e6 + 0.5) / 1e6)
    assert(candidates.contains(est), s"est $est is not a linear-counting value")
    // linear counting at this density is accurate to a few percent
    assert(math.abs(est - n) / n < 0.10, s"est $est vs exact $n")
  }
}
