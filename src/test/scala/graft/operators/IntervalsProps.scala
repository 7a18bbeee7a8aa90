package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck invariants: the sweep-line operators against
  * brute-force reference implementations on random interval sets.
  */
object IntervalsProps extends Properties("Intervals") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val intervalsGen: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      s <- Gen.chooseNum(0L, 60L)
      len <- Gen.chooseNum(1L, 15L)
    } yield (s, s + len)).map(_.take(40))

  property("maxConcurrent == brute-force sweep") = forAll(intervalsGen) {
    iv =>
      val got = Intervals.maxConcurrent(
          iv.map { case (s, e) => ("g", s, e) }.toDF("g", "s", "e"),
          Seq("g"), "s", "e")
        .as[(String, Long)].collect().head._2
      // at every start boundary count open intervals (ends exclusive)
      val want = iv.map { case (s, _) =>
        iv.count { case (s2, e2) => s2 <= s && s < e2 }
      }.max.toLong
      got == want
  }

  property("mergeOverlaps == brute-force union, islands disjoint") =
    forAll(intervalsGen) { iv =>
      val got = Intervals.mergeOverlaps(
          iv.map { case (s, e) => ("g", s, e) }.toDF("g", "s", "e"),
          Seq("g"), "s", "e")
        .select($"s", $"e", $"n_merged")
        .as[(Long, Long, Long)].collect().toList.sortBy(_._1)
      val want = iv.sorted.foldLeft(List.empty[(Long, Long, Long)]) {
        case ((ms, me, n) :: rest, (s, e)) if s <= me =>
          (ms, math.max(me, e), n + 1) :: rest
        case (acc, (s, e)) => (s, e, 1L) :: acc
      }.reverse
      val disjoint = got.sliding(2).forall {
        case List((_, e1, _), (s2, _, _)) => e1 < s2
        case _ => true
      }
      got == want && disjoint
    }
}
