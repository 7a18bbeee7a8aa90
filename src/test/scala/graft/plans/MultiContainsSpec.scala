package graft.plans

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: the Aho–Corasick multi-pattern scan ≡
  * `patterns.count(text.contains(_))` — raw substring semantics, on
  * adversarial inputs (overlapping patterns, patterns that are
  * prefixes/suffixes of each other, repeated text, multi-byte UTF-8)
  * — plus the codegen and eval paths agreeing.
  */
object MultiContainsSpec extends Properties("MultiContains") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // tiny alphabet forces overlaps, shared prefixes, and containment
  private val patGen: Gen[List[String]] = Gen
    .nonEmptyListOf(Gen.nonEmptyListOf(Gen.oneOf("a", "b", "¢"))
      .map(_.take(5).mkString))
    .map(_.distinct.take(12))

  private val textGen: Gen[String] =
    Gen.listOf(Gen.oneOf("a", "b", "c", "¢")).map(_.take(60).mkString)

  property("countDistinct == patterns.count(text.contains)") =
    forAll(patGen, Gen.listOfN(8, textGen)) { (pats, texts) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text").repartition(3)
      val got = df
        .select($"id", MultiContainsCount($"text", pats).as("n"))
        .as[(Long, Long)].collect().toMap
      val want = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> pats.count(t.contains(_)).toLong
      }.toMap
      got == want
    }

  property("interpreted eval == automaton reference (codegen off)") =
    forAll(patGen, textGen) { (pats, text) =>
      // direct expression eval (no codegen): the nullSafeEval path
      val expr = MultiContainsCount(
        org.apache.spark.sql.catalyst.expressions.Literal(text), pats)
      val got = expr.eval(null).asInstanceOf[Long]
      got == pats.count(text.contains(_)).toLong
    }

  property("early exit: all patterns present still counts all") =
    forAll(patGen) { pats =>
      val text = pats.mkString("|")
      val expr = MultiContainsCount(
        org.apache.spark.sql.catalyst.expressions.Literal(text), pats)
      expr.eval(null).asInstanceOf[Long] == pats.size.toLong
    }

  /** OVERLAPPING occurrences: count of start positions j with
    * text.startsWith(p, j) — the position-scan definition the q274
    * oracle replays in SQL.
    */
  private def refOcc(text: String, p: String): Long =
    (0 to text.length - p.length).count(text.startsWith(p, _)).toLong

  property("countsPerPattern == position-scan occurrence counts") =
    forAll(patGen, Gen.listOfN(6, textGen)) { (pats, texts) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text").repartition(3)
      val got = df
        .select($"id", MultiContainsCounts($"text", pats).as("ns"))
        .as[(Long, Seq[Long])].collect().toMap
      val want = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> pats.map(refOcc(t, _))
      }.toMap
      got.view.mapValues(_.toList).toMap ==
        want.view.mapValues(_.toList).toMap
    }

  property("counts > 0 exactly where countDistinct counts") =
    forAll(patGen, textGen) { (pats, text) =>
      val lit = org.apache.spark.sql.catalyst.expressions.Literal(text)
      val n = MultiContainsCount(lit, pats).eval(null)
        .asInstanceOf[Long]
      val ns = MultiContainsCounts(lit, pats).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray()
      ns.count(_ > 0).toLong == n
    }
}
