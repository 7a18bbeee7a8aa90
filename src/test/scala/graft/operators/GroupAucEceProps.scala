package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: the fully-distributed per-group AUC agrees with the
  * bounded-collect single-group operator run on each group's slice
  * (and hence, transitively, with RankEvalProps' pairwise reference),
  * and eceBins matches a direct integer fold plus the double ECE to
  * quantization tolerance — any partitioning.
  */
object GroupAucEceProps extends Properties("GroupAucEce") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val groupedGen: Gen[List[(String, Long, Long)]] =
    Gen.nonEmptyListOf(for {
      g <- Gen.oneOf("a", "b", "c", "d")
      s <- Gen.chooseNum(0L, 12L)
      y <- Gen.oneOf(0L, 1L)
    } yield (g, s, y))

  property("groupAuc == aucAndBestF1 per group slice") =
    forAll(groupedGen) { rows =>
      val df = rows.toDF("g", "s", "y").repartition(5)
      val got = RankEval.groupAuc(df, "g", "s", "y")
        .as[(String, Long, Long, Long, Long)].collect()
        .sortBy(_._1).toList
      val want = rows.groupBy(_._1).toList.map { case (g, l) =>
        val slice = l.map(t => (t._2, t._3))
          .toDF("s", "y").repartition(3)
        val (n, np, nn, auc) = RankEval.aucAndBestF1(slice, "s", "y")
          .selectExpr("n", "n_pos", "n_neg", "auc_bp")
          .as[(Long, Long, Long, Long)].head()
        (g, n, np, nn, auc)
      }.sortBy(_._1)
      got == want
    }

  private val eceGen: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      s <- Gen.chooseNum(0L, 10000L)
      y <- Gen.oneOf(0L, 1L)
    } yield (s, y))

  property("eceBins == direct integer fold; ece_bp within 1 bp of " +
      "double ECE") =
    forAll(eceGen) { rows =>
      val B = 10
      val df = rows.toDF("s", "y").repartition(5)
      val got = Calibrate.eceBins(df, "s", "y", B)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .sortBy(_._1).toList
      val byBin = rows.groupBy { case (s, _) =>
        math.min(s * B / 10000, B - 1L)
      }
      val want = byBin.toList.map { case (b, l) =>
        val n = l.size.toLong
        val pos = l.map(_._2).sum
        val conf = l.map(_._1).sum
        (b, n, pos, conf, math.abs(10000 * pos - conf))
      }.sortBy(_._1)
      val eceWant =
        want.map(_._5).sum / rows.size
      val exactOk = got.map(t => (t._1, t._2, t._3, t._4, t._5)) ==
        want && got.forall(_._6 == eceWant)
      val dbl = byBin.values.map { l =>
        val n = l.size.toDouble
        val acc = l.map(_._2).sum / n
        val conf = l.map(_._1).sum / n / 10000.0
        n / rows.size * math.abs(acc - conf)
      }.sum
      exactOk && math.abs(eceWant / 10000.0 - dbl) <= 1.0001e-4
    }
}
