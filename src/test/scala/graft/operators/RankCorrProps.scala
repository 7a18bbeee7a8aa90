package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: the grid suffix-sum concordance counts equal the naive
  * O(n²) pair loop, the pair-count identity conc + disc + ties = pairs
  * holds, Spearman's signed square matches both an independent
  * per-element midrank reference (exact) and the double Pearson (to
  * tolerance), any partitioning.
  */
object RankCorrProps extends Properties("RankCorr") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val dataGen: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      x <- Gen.chooseNum(0L, 7L) // small range forces heavy ties
      y <- Gen.chooseNum(0L, 7L)
    } yield (x, y))

  private def run(rows: List[(Long, Long)]) =
    RankCorr.spearmanKendall(
      rows.toDF("x", "y").repartition(5), "x", "y")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .head()

  property("conc/disc/ties == naive O(n²) pair loop; identity " +
      "conc+disc+ties_x+ties_y-ties_xy == pairs") =
    forAll(dataGen) { rows =>
      val (n, pairs, conc, disc, tx, ty, txy, tauNum, _, _) = run(rows)
      val idx = rows.indices
      var c, d, wtx, wty, wtxy = 0L
      for (i <- idx; j <- idx if i < j) {
        val (xi, yi) = rows(i); val (xj, yj) = rows(j)
        val sx = java.lang.Long.compare(xi, xj)
        val sy = java.lang.Long.compare(yi, yj)
        if (sx == 0 && sy == 0) { wtx += 1; wty += 1; wtxy += 1 }
        else if (sx == 0) wtx += 1
        else if (sy == 0) wty += 1
        else if (sx == sy) c += 1
        else d += 1
      }
      n == rows.size.toLong &&
        pairs == rows.size.toLong * (rows.size - 1) / 2 &&
        conc == c && disc == d && tx == wtx && ty == wty &&
        txy == wtxy && tauNum == c - d &&
        conc + disc + tx + ty - txy == pairs
    }

  property("rho2_signed_bp == exact reference on per-element doubled " +
      "midranks, and tracks double Pearson within 1 bp") =
    forAll(dataGen) { rows =>
      val (_, _, _, _, _, _, _, _, tau2, rho2) = run(rows)
      val n = rows.size
      // independent midranks: per element, 2R = 2·(#smaller) + (#equal) + 1
      def ranks2(vs: List[Long]): List[Long] =
        vs.map(v => 2L * vs.count(_ < v) + vs.count(_ == v) + 1)
      val u = ranks2(rows.map(_._1))
      val v = ranks2(rows.map(_._2))
      val su = u.map(BigInt(_)).sum
      val sv = v.map(BigInt(_)).sum
      val suu = u.map(x => BigInt(x) * x).sum
      val svv = v.map(x => BigInt(x) * x).sum
      val suv = u.zip(v).map { case (a, b) => BigInt(a) * b }.sum
      val num = n * suv - su * sv
      val varx = n * suu - su * su
      val vary = n * svv - sv * sv
      val wantRho2 =
        if (varx * vary == 0) 0L
        else {
          val mag = num * num * 10000 / (varx * vary)
          (if (num < 0) -mag else mag).toLong
        }
      val exactOk = rho2 == wantRho2
      val doubleOk =
        if (varx * vary == 0) rho2 == 0L
        else {
          val r = num.toDouble / math.sqrt((varx * vary).toDouble)
          val signed = math.signum(r) * r * r * 10000
          math.abs(rho2 - signed) <= 1.5
        }
      // tau_b signed square vs double reference too
      val tauOk = {
        val (_, pairs, conc, disc, tx, ty, _, _, _, _) = run(rows)
        val den = (BigInt(pairs) - tx) * (BigInt(pairs) - ty)
        if (den == 0) tau2 == 0L
        else {
          val t = (conc - disc).toDouble / math.sqrt(den.toDouble)
          math.abs(tau2 - math.signum(t) * t * t * 10000) <= 1.5
        }
      }
      exactOk && doubleOk && tauOk
    }

  property("axis-bound guard fires past 256 distinct values") = {
    val rows = (0L until 300L).map(i => (i, i)).toList
    try {
      run(rows); false
    } catch {
      case e: IllegalArgumentException =>
        e.getMessage.contains("quantize first")
    }
  }
}
