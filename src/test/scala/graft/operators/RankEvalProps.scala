package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: the midrank AUC equals the naive pairwise
  * Mann–Whitney count (wins + half-ties), and the quantized-key F1
  * argmax picks the exact-rational-best threshold (smallest-t
  * tie-break) — both against brute-force references on random scored
  * labels, any partitioning.
  */
object RankEvalProps extends Properties("RankEval") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val dataGen: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      s <- Gen.chooseNum(0L, 12L) // small range forces heavy ties
      y <- Gen.oneOf(0L, 1L)
    } yield (s, y))

  property("auc_bp == floor(pairwise Mann-Whitney · 10000)") =
    forAll(dataGen) { rows =>
      val df = rows.toDF("score", "y").repartition(5)
      val got = RankEval.aucAndBestF1(df, "score", "y")
        .select($"auc_bp").as[Long].head()
      val posS = rows.filter(_._2 == 1).map(_._1)
      val negS = rows.filter(_._2 == 0).map(_._1)
      if (posS.isEmpty || negS.isEmpty) got == -1L
      else {
        val wins2 = posS.map(p =>
          2L * negS.count(_ < p) + negS.count(_ == p)).sum
        got == (BigInt(wins2) * 10000 /
          (2 * BigInt(posS.size) * negS.size)).toLong
      }
    }

  property("best F1 threshold == exact-rational brute force, " +
      "smallest-t ties") =
    forAll(dataGen) { rows =>
      val df = rows.toDF("score", "y").repartition(5)
      val r = RankEval.aucAndBestF1(df, "score", "y")
        .select($"best_t", $"tp", $"fp", $"fn", $"f1_bp")
        .as[(Long, Long, Long, Long, Long)].head()
      val nPos = rows.count(_._2 == 1).toLong
      val cands = rows.map(_._1).distinct.sorted.map { t =>
        val tp = rows.count { case (s, y) => s >= t && y == 1 }.toLong
        val fp = rows.count { case (s, y) => s >= t && y == 0 }.toLong
        val fn = nPos - tp
        (t, tp, fp, fn, 2 * tp + fp + fn)
      }
      // exact rational max: 2tp/denom compared by cross-product
      val best = cands.reduceLeft { (a, b) =>
        val cmp = BigInt(2 * a._2) * b._5 - BigInt(2 * b._2) * a._5
        if (cmp > 0 || (cmp == 0 && a._1 < b._1)) a else b
      }
      r == ((best._1, best._2, best._3, best._4,
        if (best._5 == 0) 0L else 10000L * 2 * best._2 / best._5))
    }
}
