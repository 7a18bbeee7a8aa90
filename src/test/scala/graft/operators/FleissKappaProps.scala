package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: the distributed Fleiss' κ aggregates reproduce the
  * textbook per-item formula computed directly in BigInt — P̄o, P̄e,
  * and the exact num/den pair — for 2..5 raters over random
  * categorical ratings, any partitioning. Degenerate corpora
  * (every rater always agrees) pin num = den = 0.
  */
object FleissKappaProps extends Properties("FleissKappa") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val ratingsGen: Gen[(Int, List[List[String]])] = for {
    nRaters <- Gen.chooseNum(2, 5)
    items <- Gen.nonEmptyListOf(
      Gen.listOfN(nRaters, Gen.oneOf("a", "b", "c")))
  } yield (nRaters, items)

  property("po/pe/num/den == direct BigInt formula") =
    forAll(ratingsGen) { case (nRaters, items) =>
      val df = items.zipWithIndex
        .map { case (rs, i) => (i.toLong, rs) }
        .toDF("item", "rs")
        .selectExpr(Seq("item") ++
          (0 until nRaters).map(j => s"rs[$j] AS r$j"): _*)
        .repartition(5)
      val got = Association
        .fleissKappa(df, "item", (0 until nRaters).map(j => s"r$j"))
        .as[(Long, Long, Long, Long, Long, Long)].head()
      val bigN = BigInt(items.size)
      val n = BigInt(nRaters)
      val s = items.map(rs =>
        rs.groupBy(identity).values.map(g => BigInt(g.size).pow(2)).sum
      ).sum
      val t = items.flatten.groupBy(identity).values
        .map(g => BigInt(g.size).pow(2)).sum
      val nn = bigN * n
      val want = (
        bigN.toLong, nRaters.toLong,
        (10000 * (s - nn) / (nn * (n - 1))).toLong,
        (10000 * t / (nn * nn)).toLong,
        (nn * (s - nn) - (n - 1) * t).toLong,
        ((n - 1) * (nn * nn - t)).toLong)
      got == want
    }

  property("unanimous raters pin num = den = 0 and po_bp = 10000") = {
    val df = (0L until 7L).map(i => (i, "a", "a", "a"))
      .toDF("item", "r1", "r2", "r3")
    val (_, _, po, _, num, den) = Association
      .fleissKappa(df, "item", Seq("r1", "r2", "r3"))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    po == 10000L && num == 0L && den == 0L
  }
}
