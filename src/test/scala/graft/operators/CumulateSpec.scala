package graft.operators

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Cumulation kernel: the three fixture cases the reference's feedback
  * file calls out as mandatory (FIXTURES.md §2: present-yesterday-only,
  * present-today-only, present-both).
  */
class CumulateSpec extends SparkSpec {
  import spark.implicits._

  private val d1 = Date.valueOf("2024-01-01")
  private val d2 = Date.valueOf("2024-01-02")

  test("full-outer merge covers carry / seed / append") {
    val yesterday = Seq((1L, Seq(d1)), (2L, Seq(d1)))
      .toDF("user_id", "dates_active")
    val today = Seq((2L, d2), (3L, d2)).toDF("user_id", "day")
    val got = Cumulate.fullOuterMerge(yesterday, today, Seq("user_id"),
      Seq(Cumulate.MergeCol("dates_active",
        Cumulate.appendDate(col("y_dates_active"), col("t_day")))))
    val expected = Seq(
      (1L, Seq(d1)),        // carried unchanged
      (2L, Seq(d1, d2)),    // appended
      (3L, Seq(d2)))        // seeded from empty array, not NULL
      .toDF("user_id", "dates_active")
    assertDfEquality(got, expected)
  }

  test("appendDate seeds an empty typed array, never NULL") {
    val today = Seq((9L, d1)).toDF("user_id", "day")
    val yesterday = Seq.empty[(Long, Seq[Date])]
      .toDF("user_id", "dates_active")
    val got = Cumulate.fullOuterMerge(yesterday, today, Seq("user_id"),
      Seq(Cumulate.MergeCol("dates_active",
        Cumulate.appendDate(col("y_dates_active"), col("t_day")))))
    assert(got.collect().head.getSeq[Date](1) == Seq(d1))
  }
}
