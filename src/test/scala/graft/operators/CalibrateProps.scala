package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: the PAV fold is the isotonic regression — pinned
  * against the independent MINIMAX characterization
  * fit[i] = max_{k≤i} min_{j≥i} avg(k..j) in exact BigInt rationals
  * (two different algorithms, one answer), plus monotonicity, mass
  * preservation, and the distributed binned operator ≡ the driver
  * fold under any partitioning.
  */
object CalibrateProps extends Properties("Calibrate") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val binsGen: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      n <- Gen.chooseNum(1L, 30L)
      pos <- Gen.chooseNum(0L, n)
    } yield (n, pos)).map(_.take(12))

  // exact rational (pos, n) ordering by cross-multiplication
  private def lt(a: (BigInt, BigInt), b: (BigInt, BigInt)): Boolean =
    a._1 * b._2 < b._1 * a._2
  private implicit val ratOrd: Ordering[(BigInt, BigInt)] =
    (a, b) => if (lt(a, b)) -1 else if (lt(b, a)) 1 else 0

  private def minimax(bins: Seq[(Long, Long)])
      : Seq[(BigInt, BigInt)] = {
    val n = bins.size
    def avg(k: Int, j: Int): (BigInt, BigInt) = {
      val seg = bins.slice(k, j + 1)
      (BigInt(seg.map(_._2).sum), BigInt(seg.map(_._1).sum))
    }
    (0 until n).map { i =>
      (0 to i).map { k => (i until n).map(j => avg(k, j)).min }.max
    }
  }

  property("pav == minimax characterization (exact rationals)") =
    forAll(binsGen) { bins =>
      val got = Calibrate.pav(bins)
      val want = minimax(bins)
      got.zip(want).forall { case (p, (mp, mn)) =>
        BigInt(p.pos) * mn == mp * BigInt(p.n)
      }
    }

  property("pav is monotone, and the identity on already-monotone " +
      "input") =
    forAll(binsGen) { bins =>
      val got = Calibrate.pav(bins)
      val mono = got.sliding(2).forall {
        case Seq(a, b) => a.pos * b.n <= b.pos * a.n
        case _ => true
      }
      // an already-monotone sequence has no violators: every bin is
      // its own pool
      val sorted = bins.sortBy { case (n, pos) =>
        (BigInt(pos), BigInt(n))
      }(ratOrd)
      val identity = Calibrate.pav(sorted)
        .zip(sorted).forall { case (p, (n, pos)) =>
          p.n == n && p.pos == pos
        }
      mono && identity
    }

  private val rowsGen: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      s <- Gen.chooseNum(-50L, 50L)
      y <- Gen.oneOf(0L, 1L)
    } yield (s, y))

  property("isotonicBins == binned driver fold, any partitioning") =
    forAll(rowsGen, Gen.chooseNum(1, 8)) { (rows, nBins) =>
      val df = rows.toDF("score", "y").repartition(5)
      val got = Calibrate.isotonicBins(df, "score", "y", nBins)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toList
      val lo = rows.map(_._1).min
      val width = rows.map(_._1).max - lo + 1
      val binned = rows
        .groupBy { case (s, _) => (s - lo) * nBins / width }
        .toList.sortBy(_._1)
        .map { case (b, l) =>
          (b, l.size.toLong, l.map(_._2).sum)
        }
      val pooled = Calibrate.pav(binned.map { case (_, n, p) => (n, p) })
      // score_lo = smallest score of bin b: the CEILING of b·width/B
      // (the floor can name a score belonging to b−1 — ADVICE r6)
      val want = binned.zip(pooled).map { case ((b, n, pos), p) =>
        (b, lo + (b * width + nBins - 1) / nBins, n, pos,
          10000L * pos / n, 10000L * p.pos / p.n)
      }
      got == want
    }
}
