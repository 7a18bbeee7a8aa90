package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-12 optimization guard: [[LangModel.trainBigramPair]] (one
  * corpus read per stage, conditional counts) must be ROW-IDENTICAL to
  * the two-pass composition it replaced in q269/q275 — both pruned
  * model tables, the add-one constants, and the downstream
  * contrastBits scores. Exercised at prune cuts that BIND (the corpus
  * has more types/bigrams than K) so the top-K tie-break path is the
  * one compared, and with a slice predicate that leaves both an
  * in-slice-only and an out-of-slice-only vocabulary.
  */
class LangModelPairSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "en", "the cat sat on the mat the cat ran"),
    (2L, "en", "a dog and a cat and a bird"),
    (3L, "de", "der hund und die katze und der vogel"),
    (4L, "de", "die katze sitzt auf der matte"),
    (5L, "en", "the bird sat on a dog"),
    (6L, "fr", "le chat et le chien et le chat"),
    (7L, "en", "one"), // < 2 tokens: unigrams count, no transitions
    (8L, "fr", "le chien")
  ).toDF("doc_id", "lang", "text")

  private def tables(lm: LangModel.BigramLm) = (
    lm.bi.collect().map(_.toString).sorted.toSeq,
    lm.uni.collect().map(_.toString).sorted.toSeq,
    lm.nTokens, lm.vocab)

  test("trainBigramPair == (trainBigram slice, trainBigram all), " +
      "binding prunes") {
    for ((biK, uniK) <- Seq((512, 24), (5, 3), (1, 1))) {
      val (pt, ps) = LangModel.trainBigramPair(
        docs, $"lang" === "en", $"text", biK = biK, uniK = uniK)
      val t = LangModel.trainBigram(
        docs.filter($"lang" === "en"), $"text", biK = biK, uniK = uniK)
      val s = LangModel.trainBigram(docs, $"text",
        biK = biK, uniK = uniK)
      assert(tables(pt) == tables(t), s"target model at biK=$biK")
      assert(tables(ps) == tables(s), s"source model at biK=$biK")
    }
  }

  test("contrastBits over the fused pair == over the two-pass pair") {
    val (pt, ps) = LangModel.trainBigramPair(
      docs, $"lang" === "en", $"text", biK = 5, uniK = 3)
    val t = LangModel.trainBigram(
      docs.filter($"lang" === "en"), $"text", biK = 5, uniK = 3)
    val s = LangModel.trainBigram(docs, $"text", biK = 5, uniK = 3)
    assertDfEquality(
      LangModel.contrastBits(docs, Seq("doc_id"), $"text", pt, ps),
      LangModel.contrastBits(docs, Seq("doc_id"), $"text", t, s))
  }
}
