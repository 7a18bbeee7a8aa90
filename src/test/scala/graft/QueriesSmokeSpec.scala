package graft

/** t1-style smoke: every declared query runs on sf0.001 and returns
  * rows. Deep value correctness is the driver's DuckDB oracle (and
  * `tools/check_oracle.py` locally); this guards against regressions
  * that break a plan outright.
  */
class QueriesSmokeSpec extends SparkSpec {
  SparkEntry.allQueries.foreach { q =>
    test(s"${q.name} runs non-empty on sf0.001") {
      assert(q.run(spark, sfDir).count() > 0, s"${q.name} returned 0 rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
