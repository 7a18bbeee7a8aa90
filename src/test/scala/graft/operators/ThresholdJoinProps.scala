package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck invariant for [[Dedup.thresholdJoin]]: on ANY corpus
  * over a tiny shared vocabulary (dense shingle collisions, borderline
  * similarities), the prefix-filtered + length-banded + positionally
  * pruned join must return EXACTLY the brute-force threshold Jaccard
  * pairs — the no-false-negative theorem for the whole pruning stack,
  * not just one seeded corpus (DedupSpec covers that single case).
  */
object ThresholdJoinProps extends Properties("Dedup.thresholdJoin") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  // each case runs the full distributed join stack (window + two
  // localCheckpoints + self-join) — 15 random corpora × random
  // thresholds cover the boundary cases without a multi-minute suite
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  // docs of 3..14 tokens over 6 words → 3-gram shingle sets collide
  // across documents constantly, and many pairs sit exactly at the
  // threshold boundary
  private val corpusGen: Gen[List[String]] =
    Gen.listOfN(12,
      Gen.choose(3, 14).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f"))
          .map(_.mkString(" "))))

  private val thresholdGen: Gen[Int] = Gen.oneOf(5000, 6000, 7000, 9000)

  property("equals brute force for random corpora and thresholds") =
    forAll(corpusGen, thresholdGen) { (texts, bp) =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Dedup.thresholdJoin(docs, "text", "doc_id", bp)
        .select($"id_a", $"id_b", $"j_bp")
        .as[(Long, Long, Long)].collect().toSet

      val staged = docs
        .select($"doc_id", graft.functions.TextFunctions
          .sortedShingles($"text").as("sh"))
        .filter(size($"sh") > 0)
      val brute = staged.as("a")
        .join(staged.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          graft.plans.SortedIntersectCount(col("a.sh"), col("b.sh"))
            .as("i"),
          (size(col("a.sh")) + size(col("b.sh"))).as("s"))
        .select($"id_a", $"id_b",
          expr("(i * 10000) DIV (s - i)").as("j_bp"))
        .filter($"j_bp" >= bp)
        .as[(Long, Long, Long)].collect().toSet

      val ok = got == brute
      if (!ok) println(s"thresholdJoin mismatch at bp=$bp: " +
        s"missing=${brute -- got} extra=${got -- brute}")
      ok
    }
}
