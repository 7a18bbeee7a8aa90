package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** [[Dedup.longestDupSpan]]'s diagonal-run formulation vs the
  * quadratic token-level longest-common-substring DP: on ANY corpus
  * over a tiny vocabulary (maximizing shared and repeated spans), every
  * pair with LCS ≥ k must appear with span_tokens == LCS exactly, and
  * no pair with LCS < k may appear. The tiny vocabulary also forces
  * repeated shingles WITHIN one document, exercising the
  * multiple-positions-per-hash paths of the diagonal grouping.
  */
object LongestDupSpanProps extends Properties("Dedup.longestDupSpan") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val k = 3

  private val docGen: Gen[String] =
    Gen.choose(0, 25).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))

  private val corpusGen: Gen[List[String]] =
    Gen.choose(2, 8).flatMap(n => Gen.listOfN(n, docGen))

  /** Quadratic DP longest common SUBSTRING over token sequences. */
  private def lcsTokens(a: Seq[String], b: Seq[String]): Int = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    var best = 0
    for (i <- 1 to a.length; j <- 1 to b.length)
      if (a(i - 1) == b(j - 1)) {
        dp(i)(j) = dp(i - 1)(j - 1) + 1
        if (dp(i)(j) > best) best = dp(i)(j)
      }
    best
  }

  // generator docs carry no leading/trailing whitespace, so this is
  // exactly Spark's split(lower(text), "\\s+") minus the empty-doc
  // artifact (Spark yields [""] there; both sides then see no shingle)
  private def tokensOf(text: String): Seq[String] =
    text.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  property("== quadratic LCS DP for every pair, present iff LCS >= k") =
    forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup
        .longestDupSpan(docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .as[(Long, Long, Long)].collect()
        .map { case (a, b, s) => (a, b) -> s }.toMap
      val expected = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        l = lcsTokens(tokensOf(ta), tokensOf(tb)) if l >= k
      } yield (ia, ib) -> l.toLong).toMap
      val ok = got == expected
      if (!ok) println(s"texts=$texts\n got=$got\n expected=$expected")
      ok
    }

  property("maxDf cap only ever removes pairs, never changes a " +
    "surviving span upward") =
    forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val exact = Dedup.longestDupSpan(docs, "doc_id", "text", k)
        .as[(Long, Long, Long)].collect()
        .map { case (a, b, s) => (a, b) -> s }.toMap
      val capped = Dedup
        .longestDupSpan(docs, "doc_id", "text", k, maxDf = Some(2L))
        .as[(Long, Long, Long)].collect()
        .map { case (a, b, s) => (a, b) -> s }.toMap
      capped.forall { case (pair, s) =>
        exact.contains(pair) && s <= exact(pair)
      }
    }
}
