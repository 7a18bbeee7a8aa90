package graft

import org.apache.spark.sql.functions._

/** Accuracy contract for the sketch-based distinct-count variant. */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact at default precision") {
    // q9 now emits the 5%-envelope verdict itself (approx_ok), so the
    // oracle hash compare asserts accuracy too — here we assert every
    // group's verdict directly
    val rows = queries.Relational.q9_approx_distinct
      .run(spark, "/root/testdata/sf0.01")
      .as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, exact, ok) =>
      assert(ok, s"$et: approx_count_distinct outside 5% of $exact")
    }
  }
}
