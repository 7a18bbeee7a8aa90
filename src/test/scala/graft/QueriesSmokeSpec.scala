package graft

/** t1-style smoke: every declared query runs on sf0.001 and returns
  * rows. Deep value correctness is the driver's DuckDB oracle (and
  * `tools/check_oracle.py` locally); this guards against regressions
  * that break a plan outright.
  */
class QueriesSmokeSpec extends SparkSpec {
  // counts precomputed 8-way on first access (suite wall time, r12
  // verdict #1): the per-test assert keeps its per-query name and
  // failure attribution, only the execution overlaps — the same
  // concurrent-jobs-on-one-session shape Bench's warmup uses
  private lazy val counts: Map[String, Either[Throwable, Long]] = {
    // force the session OUTSIDE the pool: both lazy vals share this
    // instance's monitor, so a worker touching `spark` while `counts`
    // initializes would deadlock
    val s = spark
    PlanScan.sweep8(SparkEntry.allQueries) { q =>
      q.name -> (try Right(q.run(s, sfDir).count())
        catch { case e: Throwable => Left(e) })
    }.toMap
  }

  SparkEntry.allQueries.foreach { q =>
    test(s"${q.name} runs non-empty on sf0.001") {
      counts(q.name) match {
        case Right(n) => assert(n > 0, s"${q.name} returned 0 rows")
        case Left(e) => fail(s"${q.name} failed: $e")
      }
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
