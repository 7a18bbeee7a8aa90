package graft.operators

import java.sql.Date
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck invariants for the datelist bitmask (SURVEY §5 plan:
  * property tests of the datelist/bitmask encoding).
  */
object DatelistProps extends Properties("Datelist") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._
  private val anchor = lit("2024-01-01").cast("date")
  private def d(idx: Int) =
    Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(idx))

  private val daySets: Gen[Set[Int]] =
    Gen.containerOf[Set, Int](Gen.choose(0, 63))

  property("decode . encode = identity; popcount = cardinality") =
    forAll(daySets) { idxs =>
      val days = idxs.toSeq.sorted.map(d)
      val df = Seq(Tuple1(days)).toDF("days")
      val row = df.select(
        Datelist.decode(Datelist.encode($"days", anchor), anchor)
          .as("back"),
        Datelist.activeDays(Datelist.encode($"days", anchor)).as("n"))
        .head()
      row.getSeq[Date](0) == days && row.getInt(1) == idxs.size
    }

  property("reanchor(mask, d, w) = encode against the advanced anchor " +
    "restricted to its w-day window (the BIT(32) wraparound law)") =
    forAll(daySets, Gen.choose(0, 70), Gen.oneOf(32, 64)) {
      (idxs, adv, width) =>
        val days = idxs.toSeq.sorted.map(d)
        val df = Seq(Tuple1(days)).toDF("days")
        val got = df.select(
          Datelist.reanchor(Datelist.encode($"days", anchor),
            lit(adv), width)).as[Long].head()
        val expected = idxs
          .filter(i => i >= adv && i - adv < width)
          .foldLeft(0L)((m, i) => m | (1L << (i - adv)))
        got == expected
    }

  property("windowMask counts exactly the in-window days") =
    forAll(daySets, Gen.choose(0, 57)) { (idxs, from) =>
      val days = idxs.toSeq.sorted.map(d)
      val df = Seq(Tuple1(days)).toDF("days")
      val hit = df.select(
        Datelist.activeInWindow(Datelist.encode($"days", anchor), from, 7))
        .head().getBoolean(0)
      hit == idxs.exists(i => i >= from && i < from + 7)
    }
}
