package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: the distributed Krippendorff's α reproduces the
  * textbook coincidence-matrix formula computed directly in BigInt —
  * under MISSING ratings (the regime that distinguishes it from
  * Fleiss), any rater count 2..5, any partitioning — and McNemar's
  * counts equal the direct fold with the b/c swap symmetry.
  */
object KrippendorffProps extends Properties("Krippendorff") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(30)

  private val ratingsGen: Gen[(Int, List[List[Option[String]]])] = for {
    nRaters <- Gen.chooseNum(2, 5)
    items <- Gen.nonEmptyListOf(Gen.listOfN(nRaters,
      Gen.frequency(3 -> Gen.oneOf("a", "b", "c").map(Option(_)),
        1 -> Gen.const(Option.empty[String]))))
  } yield (nRaters, items)

  private def reference(nRaters: Int,
      items: List[List[Option[String]]])
      : (Long, Long, Long, Long, Long, Long) = {
    val L = (1 until nRaters).map(BigInt(_))
      .foldLeft(BigInt(1))((a, b) => a * b / a.gcd(b))
    val valid = items.map(_.flatten).filter(_.size >= 2)
    val nItems = BigInt(valid.size)
    val n = BigInt(valid.map(_.size).sum)
    val oL = valid.map { rs =>
      val m = BigInt(rs.size)
      rs.groupBy(identity).values
        .map(g => BigInt(g.size) * (m - g.size) * (L / (m - 1))).sum
    }.sum
    val s = valid.flatten.groupBy(identity).values
      .map(g => BigInt(g.size).pow(2)).sum
    val doBp = if (n <= 1) BigInt(0) else 10000 * oL / (L * n)
    val deBp = if (n <= 1) BigInt(0)
      else 10000 * (n * n - s) / (n * (n - 1))
    (nItems.toLong, n.toLong, doBp.toLong, deBp.toLong,
      (L * (n * n - s) - (n - 1) * oL).toLong,
      (L * (n * n - s)).toLong)
  }

  property("n/do/de/num/den == direct BigInt coincidence formula " +
      "under missing ratings") =
    forAll(ratingsGen) { case (nRaters, items) =>
      val df = items.zipWithIndex
        .map { case (rs, i) => (i.toLong, rs.map(_.orNull)) }
        .toDF("item", "rs")
        .selectExpr(Seq("item") ++
          (0 until nRaters).map(j => s"rs[$j] AS r$j"): _*)
        .repartition(5)
      val got = Association
        .krippendorffAlpha(df, "item", (0 until nRaters).map(j => s"r$j"))
        .as[(Long, Long, Long, Long, Long, Long)].head()
      got == reference(nRaters, items)
    }

  property("perfect two-category agreement pins alpha_num == " +
      "alpha_den > 0; single-category corpora degenerate to 0/0") = {
    val two = (0L until 6L).map(i =>
        (i, if (i % 2 == 0) "a" else "b", if (i % 2 == 0) "a" else "b"))
      .toDF("item", "r1", "r2")
    val (_, _, doBp, _, num, den) = Association
      .krippendorffAlpha(two, "item", Seq("r1", "r2"))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    val one = (0L until 6L).map(i => (i, "a", "a"))
      .toDF("item", "r1", "r2")
    val (_, _, _, _, num1, den1) = Association
      .krippendorffAlpha(one, "item", Seq("r1", "r2"))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    doBp == 0L && num == den && den > 0L &&
      num1 == 0L && den1 == 0L // De = 0: no chance disagreement exists
  }

  property("items with < 2 ratings are ignored entirely") = {
    val base = List((0L, "a", "b"), (1L, "b", "b"))
    val extra = base ++ List((2L, "c", null), (3L, null, null))
    val run = (rows: List[(Long, String, String)]) => Association
      .krippendorffAlpha(rows.toDF("item", "r1", "r2"), "item",
        Seq("r1", "r2"))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    run(base) == run(extra)
  }
}

/** McNemar: counts equal a direct fold; swapping the two classifiers
  * swaps b and c but keeps both χ² statistics.
  */
object McnemarProps extends Properties("Mcnemar") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(30)

  private val rowsGen: Gen[List[(Long, Long, Long)]] =
    Gen.nonEmptyListOf(for {
      t <- Gen.oneOf(0L, 1L)
      a <- Gen.oneOf(0L, 1L)
      b <- Gen.oneOf(0L, 1L)
    } yield (t, a, b))

  private def run(rows: List[(Long, Long, Long)], aCol: String,
      bCol: String) =
    Association.mcnemar(rows.toDF("t", "a", "b").repartition(3),
        "t", aCol, bCol)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()

  property("counts and chi2 == direct fold") = forAll(rowsGen) { rows =>
    val (n, br, bw, b, c, chi2, chi2cc) = run(rows, "a", "b")
    val wantB = rows.count { case (t, a, bb) => a == t && bb != t }
    val wantC = rows.count { case (t, a, bb) => a != t && bb == t }
    val d = BigInt(wantB - wantC)
    val wantChi = if (wantB + wantC == 0) BigInt(0)
      else 1000 * d * d / (wantB + wantC)
    val wantCc = if (wantB + wantC == 0 || d.abs <= 1) BigInt(0)
      else 1000 * (d.abs - 1) * (d.abs - 1) / (wantB + wantC)
    n == rows.size.toLong && b == wantB.toLong && c == wantC.toLong &&
      br == rows.count { case (t, a, bb) => a == t && bb == t } &&
      bw == rows.count { case (t, a, bb) => a != t && bb != t } &&
      chi2 == wantChi.toLong && chi2cc == wantCc.toLong
  }

  property("swapping classifiers swaps b/c, keeps chi2") =
    forAll(rowsGen) { rows =>
      val (_, _, _, b1, c1, x1, y1) = run(rows, "a", "b")
      val (_, _, _, b2, c2, x2, y2) = run(rows, "b", "a")
      b1 == c2 && c1 == b2 && x1 == x2 && y1 == y2
    }
}
