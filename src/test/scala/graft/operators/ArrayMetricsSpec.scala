package graft.operators

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Adapts the reference's monthly_user_site_hits test
  * (`src/tests/test_monthly_user_site_hits.py:10-57`): zero-fill for
  * missing days, positional totals.
  */
class ArrayMetricsSpec extends SparkSpec {
  import spark.implicits._

  private val anchor = lit("2024-01-01").cast("date")
  private def d(day: Int) = Date.valueOf(f"2024-01-$day%02d")

  test("monthlyArray zero-fills gaps; positional totals aggregate") {
    val perDay = Seq(
      ("u1", d(1), 2L), ("u1", d(3), 4L),
      ("u2", d(2), 5L))
      .toDF("user_id", "day", "hits")
    val arrays =
      ArrayMetrics.monthlyArray(perDay, "user_id", "day", "hits", anchor)
    val expectedArrays = Seq(
      ("u1", Seq(2L, 0L, 4L)),
      ("u2", Seq(0L, 5L, 0L)))
      .toDF("user_id", "metric_array")
    assertDfEquality(arrays, expectedArrays)

    val totals = ArrayMetrics.positionalTotals(arrays, "metric_array")
    val expectedTotals = Seq((0, 2L), (1, 5L), (2, 4L))
      .toDF("day_idx", "total")
    assertDfEquality(totals, expectedTotals)
  }
}
