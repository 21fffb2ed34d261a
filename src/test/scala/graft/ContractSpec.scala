package graft

/** Pins the driver contract on SparkEntry itself — a key typo here
  * would surface only as a confusing per-query FAIL (or silent
  * rows-only downgrade) in the driver's correctness gate. */
class ContractSpec extends SparkSpec {

  test("every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracle SQL with no Spark query (driver would FAIL them): $orphans")
  }

  test("rows-only queries are exactly the trained-model pair") {
    // q48 left this set in round 9: its registered entry now serves the
    // frozen centroid table, whose probe arithmetic is hash-oracled;
    // only the in-driver MLlib/MLP trainers remain rows-only
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly ==
      Set("q29_mllib_pipeline", "q54_mlp_pipeline"),
      s"unexpected rows-only set (new query missing its oracle?): $rowsOnly")
  }

  test("flagship entry returns rows at the smoke SF") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle is non-empty SQL selecting something") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty && sql.toUpperCase.contains("SELECT"), k)
    }
  }
}
