package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}
import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** ScalaCheck: the mixture-schedule interleave ≡ a sequential
  * reference (midpoint positions per source), preserves every
  * positive-weight item exactly once, and satisfies the Bresenham
  * drift bound — in any prefix of the (pos, source, k) order, each
  * source has emitted within ±1 of its proportional share.
  */
object InterleaveProps extends Properties("Interleave") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val caseGen: Gen[List[(String, Int, Long)]] = for {
    nSrc <- Gen.chooseNum(1, 5)
    specs <- Gen.listOfN(nSrc, for {
      n <- Gen.chooseNum(0, 30)
      w <- Gen.chooseNum(0L, 1000000L)
    } yield (n, w))
  } yield specs.zipWithIndex.map { case ((n, w), i) =>
    (s"s$i", n, w) }

  private def refSchedule(specs: Seq[(String, Int, Long)])
      : Seq[(Long, String, Long)] =
    specs.filter(_._3 > 0).flatMap { case (src, n, w) =>
      (1 to n).map(k =>
        (((2L * k - 1) * 1000000L) / (2L * w), src, k.toLong))
    }.sortBy(identity)

  private def run(specs: Seq[(String, Int, Long)])
      : Seq[(Long, String, Long)] = {
    val rows = specs.flatMap { case (src, n, _) =>
      (1 to n).map(k => (src, (k * 7).toLong)) } // ids: any order key
    val weights = specs.map { case (src, _, w) => (src, w) }
      .toDF("source", "w_ppm")
    if (rows.isEmpty) Seq.empty
    else Sampling.interleaveSchedule(
        rows.toDF("source", "doc_id"), "source", "doc_id", weights)
      .select(col("pos"), col("source"), col("k"))
      .as[(Long, String, Long)].collect().toSeq.sorted
  }

  property("interleaveSchedule == sequential midpoint reference") =
    forAll(caseGen) { specs =>
      run(specs) == refSchedule(specs)
    }

  property("positive-weight items preserved exactly once; zero-weight " +
    "sources dropped") =
    forAll(caseGen) { specs =>
      val got = run(specs)
      val want = specs.collect { case (s, n, w) if w > 0 => s -> n }
      got.groupBy(_._2).view.mapValues(_.size).toMap ==
        want.filter(_._2 > 0).toMap
    }

  property("Bresenham drift: every prefix holds ~T*w/1e6 per source " +
    "(within 1 + rounding)") =
    forAll(caseGen) { specs =>
      val sched = refSchedule(specs)
      sched.nonEmpty ==> {
        // at global position P, source s must have emitted
        // floor((P*w*2 + 1e6) / 2e6) items, capped by n_s — i.e. the
        // count of k with midpoint <= P; check the closed form
        val bySrc = specs.filter(_._3 > 0).map { case (s, n, w) =>
          s -> ((n, w)) }.toMap
        val positions = sched.map(_._1).distinct
        positions.forall { p =>
          bySrc.forall { case (s, (n, w)) =>
            val emitted = sched.count(e => e._2 == s && e._1 <= p)
            val expect = math.min(n.toLong,
              (2L * p * w + 1000000L) / 2000000L)
            // closed form: #{k >= 1 : (2k-1)*1e6 div (2w) <= p}
            (emitted - expect).abs <= 1
          }
        }
      }
    }
}
