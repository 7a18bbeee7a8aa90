package graft.operators

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: [[Profile.zipfFit]] and [[Profile.rankFreqOctaves]] ≡ a
  * sequential BigInt reference (exact floor-log₂ OLS / octave rollup
  * over the (count desc, token asc) rank order), independent of input
  * partitioning — the PrefixSum-ranked pipeline must agree with a
  * single-threaded scan bit for bit, including the sign-guarded
  * integer divisions.
  */
object ZipfProps extends Properties("Zipf") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val words =
    Vector("a", "the", "data", "spark", "join", "scan", "agg", "row",
      "key", "merge", "sort", "batch", "stream", "window", "filter")

  // skewed docs: low-index words repeat far more often (Zipf-ish)
  private val genDocs: Gen[List[String]] = for {
    nDocs <- Gen.chooseNum(1, 12)
    docs <- Gen.listOfN(nDocs, for {
      len <- Gen.chooseNum(1, 30)
      toks <- Gen.listOfN(len,
        Gen.chooseNum(0.0, 1.0).map(u =>
          words(math.min((u * u * words.size).toInt, words.size - 1))))
    } yield toks.mkString(" "))
  } yield docs

  private def flog2(x: Long): Long = BigInt(x).bitLength - 1L

  // the sign-guarded floor division both engines replay: operands are
  // made non-negative before dividing, result re-signed
  private def sdiv(x: BigInt, y: BigInt): BigInt =
    if (x >= 0) x / y else -((-x) / y)

  private def rankedRef(docs: List[String]): Seq[(String, Long, Long)] =
    docs.flatMap(_.toLowerCase.split("\\s+"))
      .groupBy(identity).map { case (w, l) => (w, l.size.toLong) }
      .toSeq.sortBy { case (w, c) => (-c, w) }
      .zipWithIndex.map { case ((w, c), i) => (w, c, i + 1L) }

  property("zipfFit == sequential BigInt OLS reference") =
    forAll(genDocs) { docs =>
      val ranked = rankedRef(docs)
      val pts = ranked.map { case (_, c, rk) => (flog2(rk), flog2(c), c) }
      val n = BigInt(pts.size)
      val nt = pts.map(_._3).sum
      val sx = BigInt(pts.map(_._1).sum)
      val sy = BigInt(pts.map(_._2).sum)
      val sxy = pts.map { case (x, y, _) => BigInt(x) * y }.sum
      val sxx = pts.map { case (x, _, _) => BigInt(x) * x }.sum
      val syy = pts.map { case (_, y, _) => BigInt(y) * y }.sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val svy = n * syy - sy * sy
      val slope = if (den == 0) BigInt(0) else sdiv(1000 * num, den)
      val r2 =
        if (den == 0 || svy == 0) BigInt(0)
        else ((10000 * num.abs) / den) * num.abs / svy
      val want = (pts.size.toLong, nt, sx.toLong, sy.toLong,
        sxy.toLong, sxx.toLong, slope.toLong, r2.toLong)
      val got = Profile.zipfFit(
          docs.toDF("text").repartition(4), col("text"))
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
      got == want
    }

  property("rankFreqOctaves == sequential octave rollup") =
    forAll(genDocs) { docs =>
      val ranked = rankedRef(docs)
      val tot = ranked.map(_._2).sum
      val want = ranked.groupBy { case (_, _, rk) => flog2(rk) }
        .toSeq.sortBy(_._1)
        .map { case (o, g) =>
          val mass = g.map(_._2).sum
          (o, g.size.toLong, mass, g.map(_._2).min, g.map(_._2).max,
            if (tot == 0) 0L else 10000L * mass / tot)
        }
      val got = Profile.rankFreqOctaves(
          docs.toDF("text").repartition(4), col("text"))
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      got == want
    }
}
