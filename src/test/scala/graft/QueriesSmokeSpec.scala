package graft

/** Every declared query must run at sf0.001 and produce a non-degenerate
  * result (schema + deterministic re-execution). The value-level gate is the
  * DuckDB oracle (tools/selfcheck.py); this suite is the fast regression net.
  */
class QueriesSmokeSpec extends SparkSpec {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      val n = df.count()
      assert(n >= 0)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
