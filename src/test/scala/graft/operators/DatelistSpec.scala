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

  test("reanchor rolls off exactly the oldest bits — the reference's " +
    "BIT(32) wraparound with an explicit anchor") {
    // days at idx 0, 2, 33, 63 from the 2024-01-01 anchor
    val dates = Seq(Date.valueOf("2024-01-01"), Date.valueOf("2024-01-03"),
      Date.valueOf("2024-02-03"), Date.valueOf("2024-03-04"))
    val df = Seq(Tuple1(dates)).toDF("days")
      .select(Datelist.encode($"days", anchor).as("mask"))
    // advance 2: idx 0 rolls off, others land at 0, 31, 61
    val re2 = df.select(Datelist.reanchor($"mask", lit(2)).as("m"))
      .as[Long].head()
    assert(re2 == ((1L << 0) | (1L << 31) | (1L << 61)))
    // reanchor ≡ re-encode against the advanced anchor (the law)
    val reEnc = Seq(Tuple1(dates)).toDF("days")
      .select(Datelist.encode($"days",
        lit("2024-01-03").cast("date")).as("m")).as[Long].head()
    assert(re2 == reEnc)
    // BIT(32) width: idx 61 and 31 both exceed a 32-day window after
    // advancing 2 → only idx-0 and the day at new idx 31 survive...
    val re2w32 = df.select(
      Datelist.reanchor($"mask", lit(2), Datelist.RefWidthDays).as("m"))
      .as[Long].head()
    assert(re2w32 == ((1L << 0) | (1L << 31)))
    // a whole-window advance clears the mask (shift-by-64 guard)
    assert(df.select(Datelist.reanchor($"mask", lit(64)).as("m"))
      .as[Long].head() == 0L)
  }

  test("reanchor is a LOGICAL shift: day 63 (the sign bit) must not " +
    "smear phantom active days") {
    val df = Seq(Tuple1(Seq(Date.valueOf("2024-03-04")))).toDF("days")
      .select(Datelist.encode($"days", anchor).as("mask"))
    assert(df.select($"mask").as[Long].head() == (1L << 63)) // negative
    val re1 = df.select(Datelist.reanchor($"mask", lit(1)).as("m"))
      .as[Long].head()
    assert(re1 == (1L << 62),
      f"arithmetic shift sign-extended: 0x$re1%016x")
  }

  test("trimToRefWidth keeps exactly the reference's 32-day reach") {
    val df = Seq(Tuple1(Seq(d(1), Date.valueOf("2024-02-01"),
      Date.valueOf("2024-02-02")))).toDF("days") // idx 0, 31, 32
      .select(Datelist.encode($"days", anchor).as("mask"))
    val got = df.select(Datelist.trimToRefWidth($"mask").as("m"))
      .as[Long].head()
    assert(got == ((1L << 0) | (1L << 31))) // idx 32 is beyond BIT(32)
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
