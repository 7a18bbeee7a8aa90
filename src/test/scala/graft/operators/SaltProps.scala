package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** Salting must be a pure physical rewrite: for ANY data — skewed
  * keys, NULL keys, NULL salt sources — the two-phase salted count and
  * the salted dimension join must return exactly what their unsalted
  * forms return. (The q67/q98 oracles prove single cases; this pins
  * the law across random inputs, in particular the NULL-salt path
  * where crc32(NULL) would silently drop rows without the coalesce.)
  */
object SaltProps extends Properties("Salt") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private val rowsGen: Gen[List[(Option[String], Option[Int])]] =
    Gen.choose(1, 120).flatMap(n =>
      Gen.listOfN(n, for {
        k <- Gen.frequency(
          6 -> Gen.const(Some("hot")), // skew
          3 -> Gen.oneOf(Some("a"), Some("b"), Some("c")),
          1 -> Gen.const(Option.empty[String]))
        s <- Gen.option(Gen.choose(0, 9))
      } yield (k, s)))

  private val nGen: Gen[Int] = Gen.oneOf(1, 4, 32)

  property("saltedCount equals the plain GROUP BY count") =
    forAll(rowsGen, nGen) { (rows, n) =>
      val df = rows.toDF("k", "sf").repartition(5)
      val got = Salt.saltedCount(df, "k", "sf", n)
        .as[(Option[String], Long)].collect().toMap
      val expected = df.groupBy($"k").agg(count(lit(1)).as("n"))
        .as[(Option[String], Long)].collect().toMap
      got == expected
    }

  property("saltedJoin equals the plain join") =
    forAll(rowsGen, nGen) { (rows, n) =>
      val fact = rows.zipWithIndex
        .map { case ((k, s), i) => (k, s, i.toLong) }
        .toDF("k", "sf", "row_id").repartition(5)
      val dim = Seq(("hot", "H"), ("a", "A"), ("b", "B"), ("z", "Z"))
        .toDF("k", "label")
      val got = Salt.saltedJoin(fact, dim, "k", "sf", n)
        .select($"row_id", $"label").as[(Long, String)].collect().toSet
      val expected = fact.join(dim, Seq("k"))
        .select($"row_id", $"label").as[(Long, String)].collect().toSet
      got == expected
    }
}
