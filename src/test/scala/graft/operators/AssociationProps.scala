package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: κ against a driver fold plus its structural laws
  * (perfect agreement ⇒ num = den; label-permutation invariance), and
  * χ² against double-precision within the quantization budget plus
  * exact zero on product (independent-by-construction) tables.
  */
object AssociationProps extends Properties("Association") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val cats = Seq("u", "v", "w", "x")
  private val pairsGen: Gen[List[(String, String)]] =
    Gen.nonEmptyListOf(for {
      a <- Gen.oneOf(cats)
      b <- Gen.oneOf(cats)
    } yield (a, b))

  property("cohensKappa == driver reference; perfect agreement gives " +
      "num == den; label permutation preserves kappa") =
    forAll(pairsGen) { pairs =>
      val df = pairs.toDF("a", "b").repartition(5)
      val got = Association.cohensKappa(df, "a", "b")
        .as[(Long, Long, Long, Long, Long, Long)].head()
      val n = BigInt(pairs.size)
      val agree = BigInt(pairs.count { case (a, b) => a == b })
      val pe = cats.map { k =>
        BigInt(pairs.count(_._1 == k)) * pairs.count(_._2 == k)
      }.sum
      val refOk = got == ((n.toLong, agree.toLong,
        (agree * 10000 / n).toLong, (pe * 10000 / (n * n)).toLong,
        (n * agree - pe).toLong, (n * n - pe).toLong))
      val perfect = Association
        .cohensKappa(pairs.map(p => (p._1, p._1)).toDF("a", "b"),
          "a", "b")
        .as[(Long, Long, Long, Long, Long, Long)].head()
      val perfectOk = perfect._5 == perfect._6 && perfect._3 == 10000L
      // permute labels consistently on BOTH columns: kappa invariant
      val perm = Map("u" -> "x", "v" -> "w", "w" -> "v", "x" -> "u")
      val permuted = Association
        .cohensKappa(pairs.map { case (a, b) => (perm(a), perm(b)) }
          .toDF("a", "b"), "a", "b")
        .as[(Long, Long, Long, Long, Long, Long)].head()
      refOk && perfectOk &&
        (permuted._5, permuted._6) == ((got._5, got._6))
    }

  property("chiSquareMilli within the per-cell quantization budget " +
      "of double-precision chi2") =
    forAll(pairsGen) { pairs =>
      val df = pairs.toDF("a", "b").repartition(5)
      val (n, cells, _, milli) = Association.chiSquareMilli(df, "a", "b")
        .as[(Long, Long, Long, Long)].head()
      val as = pairs.map(_._1).distinct
      val bs = pairs.map(_._2).distinct
      val chi2 = (for (a <- as; b <- bs) yield {
        val o = pairs.count(p => p == ((a, b))).toDouble
        val e = pairs.count(_._1 == a).toDouble *
          pairs.count(_._2 == b) / n
        (o - e) * (o - e) / e
      }).sum
      math.abs(milli / 1000.0 - chi2) <= cells * 0.001 + 1e-6
    }

  property("chiSquareMilli == 0 exactly on product tables") =
    forAll(Gen.listOfN(3, Gen.chooseNum(1, 4)),
        Gen.listOfN(2, Gen.chooseNum(1, 4))) { (xs, ys) =>
      val pairs = for {
        (x, i) <- xs.zipWithIndex
        (y, j) <- ys.zipWithIndex
        _ <- 0 until x * y
      } yield (s"a$i", s"b$j")
      val (_, _, _, milli) = Association
        .chiSquareMilli(pairs.toDF("a", "b"), "a", "b")
        .as[(Long, Long, Long, Long)].head()
      milli == 0L
    }
}
