package graft.operators

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.SparkSpec

class DatelistSpec extends SparkSpec {
  import spark.implicits._

  private val anchor = lit("2024-01-01").cast("date")
  private def d(day: Int) = Date.valueOf(f"2024-01-$day%02d")

  test("encode sets one bit per active day") {
    val df = Seq((1L, Seq(d(1), d(3), d(31)))).toDF("u", "days")
    val got = df.select(Datelist.encode($"days", anchor)).as[Long].head()
    assert(got == ((1L << 0) | (1L << 2) | (1L << 30)))
  }

  test("decode inverts encode; out-of-window dates are ignored") {
    val days = Seq(d(1), d(5), d(30))
    val far = Date.valueOf("2025-06-01") // idx > 63 → dropped
    val df = Seq((1L, days :+ far)).toDF("u", "days")
    val round = df
      .select(Datelist.decode(Datelist.encode($"days", anchor), anchor)
        .as("back"))
      .as[Seq[Date]].head()
    assert(round == days)
  }

  test("popcount equals distinct active days (property over 64 cases)") {
    val rng = new scala.util.Random(42)
    val cases = (0 until 64).map { i =>
      val days = (0 to 63).filter(_ => rng.nextBoolean()).map(x =>
        Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(x)))
      (i.toLong, days)
    }
    val df = cases.toDF("u", "days")
    val bad = df
      .select($"u", Datelist.activeDays(
        Datelist.encode($"days", anchor)).as("n"), size($"days").as("m"))
      .filter($"n" =!= $"m")
    assert(bad.count() == 0)
  }

  test("window mask matches the last-7-days probe") {
    assert(Datelist.windowMask(0, 7) == 127L)
    assert(Datelist.windowMask(23, 7) == (127L << 23))
    val df = Seq((1L, Seq(d(24))), (2L, Seq(d(23)))).toDF("u", "days")
    val got = df.select($"u",
      Datelist.activeInWindow(
        Datelist.encode($"days", anchor), 23, 7).as("w"))
      .as[(Long, Boolean)].collect().toMap
    assert(got(1L) && !got(2L)) // Jan 24 = idx 23 in-window; Jan 23 not
  }
}
