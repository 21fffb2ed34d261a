package graft

import org.apache.spark.sql.functions._

/** As-of and range joins vs brute-force references at sf0.001. */
class TimeJoinsSpec extends SparkSpec {

  test("q49 as-of join equals per-event brute-force latest-order lookup") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), unix_timestamp(col("o_orderdate")).as("sec"),
        col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = orders.groupBy(_._1)
    val got = ops.TimeJoins.q49AsofJoin(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (user, sec) = (r.getLong(0), r.getLong(2))
      val eligible = byUser.getOrElse(user, Array.empty).filter(_._2 <= sec)
      val expected = if (eligible.isEmpty) None
        else {
          val maxSec = eligible.map(_._2).max
          Some(eligible.filter(_._2 == maxSec).map(_._3).max)
        }
      val gotKey = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(gotKey == expected, s"user $user sec $sec: $gotKey != $expected")
    }
  }

  test("q50 range join equals all-pairs reference") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val expected = ev.flatMap { case (u, id, sec) =>
      val nearby = byUser(u).filter { case (_, oid, osec) =>
        oid != id && math.abs(osec - sec) <= 3600 }
      if (nearby.isEmpty) None
      else Some((u, id) -> (nearby.length.toLong,
        nearby.map(_._3 - sec).min, nearby.map(_._3 - sec).max))
    }.toMap
    val got = ops.TimeJoins.q50RangeJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected,
      s"missing=${(expected.keySet diff got.keySet).take(3)} extra=${(got.keySet diff expected.keySet).take(3)}")
  }
}
