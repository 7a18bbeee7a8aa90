package graft

import org.apache.spark.sql.functions._

/** Accuracy contract for the sketch-based distinct-count variant. */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact at default precision") {
    val rows = queries.Relational.q9_approx_distinct
      .run(spark, "/root/testdata/sf0.01")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, exact, approx) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err < 0.05, s"$et: exact=$exact approx=$approx err=$err")
    }
  }
}
