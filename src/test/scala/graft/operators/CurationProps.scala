package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec
import graft.functions.TextFunctions

/** The q307/q309 curation-ladder laws, re-proven in-JVM on random
  * structured corpora (r11 verdict asks #3/#4):
  *
  *  1. PARTITION/ORDER INVARIANCE — every stage's keep SET (exact
  *     fingerprint dedup, substring coverage gate, MinHash near-dup
  *     dedup, decontamination, token-budget packing) is invariant
  *     under `repartition(n)` and input row order. Catches accidental
  *     order-dependence hiding in window tie-breaks or first()-style
  *     aggregation — the class of bug a single hash-pinned execution
  *     (q307's checksums) cannot distinguish from the intended rule.
  *     (SemDeDup's invariance lives with its own machinery in
  *     SemDedupProps; packing and SemDeDup have no incremental form
  *     and appear only here.)
  *
  *  2. INCREMENTAL ≡ BATCH — the q309 law: with standing ids all
  *     below delta ids (append-only contract), the incremental ladder
  *     (fingerprint anti-join, [[ExactSubstr.incrementalDupSpans]],
  *     [[Dedup.incrementalNearDup]] against the index of every doc
  *     that ENTERED yesterday's near-dup stage, per-doc decontam)
  *     keeps exactly `batch(standing ∪ delta)` restricted to delta
  *     ids, stage by stage. q309's oracle checks this law on the
  *     testdata corpus; this prop checks it on adversarial random
  *     ones (tiny vocab → hash collisions, verbatim quotes, shuffled
  *     near-dups, exact copies).
  *
  * Ladder parameters are scaled down (k=3, minTokens=4, jaccard 0.5,
  * 3-gram decontam, budget 30) — the laws are parametric; small
  * thresholds make every stage bite on 12–30-doc corpora.
  */
object CurationProps extends Properties("CurationLadder") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(4)

  private val K = 3
  private val MinTok = 4
  private val Jac = 0.5
  private val NGram = 3
  private val Budget = 30

  // vocab mixes stopwords (so packing's quality score varies) with
  // content words; tiny so runs/collisions actually happen
  private val Vocab = Vector("the", "of", "and", "fox", "dog", "qux",
    "zap", "mint", "kelp", "wren")

  /** Structured corpus: base docs plus exact copies (stage-1 prey),
    * verbatim splices (stage-2 prey: a long run from a base doc),
    * and token-shuffled rewords (stage-3 prey: high Jaccard, short
    * runs). Ids are 0..n-1 in generation order — the append-only
    * contract q309's split needs.
    */
  private val corpusGen: Gen[List[(Long, String, String)]] = for {
    nBase <- Gen.choose(6, 12)
    bases <- Gen.listOfN(nBase, for {
      n <- Gen.choose(MinTok, 24)
      ws <- Gen.listOfN(n, Gen.oneOf(Vocab))
    } yield ws)
    nDerived <- Gen.choose(4, 12)
    derived <- Gen.listOfN(nDerived, for {
      kind <- Gen.oneOf("copy", "splice", "shuffle")
      src <- Gen.choose(0, nBase - 1)
      seed <- Gen.choose(0, 1000)
    } yield (kind, src, seed))
  } yield {
    val rnd = new scala.util.Random(42)
    val all = bases.map(_.toVector) ++ derived.map {
      case ("copy", src, _) => bases(src).toVector
      case ("splice", src, seed) =>
        // most of a base doc verbatim + a couple of fresh tokens —
        // coverage >= half, so the substring gate should drop it
        val t = bases(src).toVector
        t ++ Vector(Vocab(seed % Vocab.size))
      case (_, src, seed) =>
        // same token multiset, order scrambled with a seeded rng —
        // high Jaccard (shingle sets differ, token sets match), no
        // long common run unless the scramble happens to preserve one
        new scala.util.Random(seed).shuffle(bases(src).toVector)
    }
    all.zipWithIndex.map { case (toks, i) =>
      (i.toLong, toks.mkString(" "), s"src${i % 3}")
    }
  }

  private def toDf(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "text", "source")

  private def ids(df: DataFrame): Set[Long] =
    df.select(col("doc_id")).as[Long].collect().toSet

  // ---- the batch ladder (q307's stages, parametric) ----

  private def stage1(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("_fp"))
      .groupBy(col("_fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))

  private def stage2(docs: DataFrame, keep: DataFrame): DataFrame = {
    val d = docs.join(keep, "doc_id")
    val cov = ExactSubstr.dupSpans(d, "doc_id", "text", K, MinTok)
      .groupBy(col("doc").as("doc_id")).agg(sum(col("len")).as("_dup"))
    d.select(col("doc_id"),
        size(TextFunctions.lowerTokens(col("text"))).as("_n"))
      .join(cov, Seq("doc_id"), "left")
      .filter(coalesce(col("_dup"), lit(0L)) * 2 < col("_n"))
      .select(col("doc_id"))
  }

  private def stage3(docs: DataFrame, keep: DataFrame): DataFrame =
    Dedup.nearDupDedup(docs.join(keep, "doc_id"), "text", "doc_id",
        Jac, k = 8, bands = 4)
      .select(col("doc_id"))

  private def stage4(docs: DataFrame, keep: DataFrame): DataFrame = {
    val train = docs.join(keep, "doc_id")
      .filter(TextFunctions.datasetSplit(col("doc_id")) === "train")
    val benchmark =
      docs.filter(TextFunctions.datasetSplit(col("doc_id")) === "test")
    val dirty = Decontam.ngramAudit(train, benchmark,
        "doc_id", "text", NGram)
      .filter(col("longest_run") >= NGram)
      .select(col("doc_id"))
    train.select(col("doc_id")).join(dirty, Seq("doc_id"), "left_anti")
  }

  private def stage5(docs: DataFrame, keep: DataFrame): DataFrame = {
    val q = docs.join(keep, "doc_id")
      .withColumn("_lt", TextFunctions.lowerTokens(col("text")))
      .select(col("doc_id"), col("source"), size(col("_lt")).as("_nt"),
        (size(filter(col("_lt"),
            w => w.isin(TextFunctions.EnStopwords: _*)))
          .cast("double") / size(col("_lt"))).as("_q"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("_q").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    q.withColumn("_cum", sum(col("_nt")).over(w))
      .filter(col("_cum") <= Budget)
      .select(col("doc_id"))
  }

  private def batchSets(docs: DataFrame): Seq[Set[Long]] = {
    val s1 = stage1(docs).localCheckpoint()
    val s2 = stage2(docs, s1).localCheckpoint()
    val s3 = stage3(docs, s2).localCheckpoint()
    val s4 = stage4(docs, s3).localCheckpoint()
    val s5 = stage5(docs, s4)
    Seq(ids(s1), ids(s2), ids(s3), ids(s4), ids(s5))
  }

  property("every stage's keep SET is invariant under repartition " +
    "and input row order") =
    forAll(corpusGen) { rows =>
      val reference = batchSets(toDf(rows))
      val variants = Seq(
        toDf(rows).repartition(1),
        toDf(rows).repartition(7),
        toDf(rows.reverse).repartition(3))
      variants.forall { v =>
        val got = batchSets(v)
        if (got != reference)
          println(s"[CurationProps] invariance broke: $got vs $reference")
        got == reference
      }
    }

  property("incremental(state(standing), delta) == " +
    "batch(standing ∪ delta) restricted to delta ids, per stage") =
    forAll(corpusGen) { rows =>
      val docs = toDf(rows).localCheckpoint()
      val maxId = rows.map(_._1).max
      val cut = maxId * 7 / 10 // delta ≈ 30% so both sides are real
      val standing = docs.filter(col("doc_id") <= cut)
      val delta = docs.filter(col("doc_id") > cut)
      val deltaIds = ids(delta.select(col("doc_id")))

      // batch over the union, restricted to delta
      val b = batchSets(docs).take(4).map(_.intersect(deltaIds))

      // incremental: yesterday's state from standing
      val s1fp = standing
        .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("_fp"))
        .groupBy(col("_fp")).agg(min(col("doc_id")).as("doc_id"))
        .localCheckpoint()
      val s1Docs = docs.join(s1fp.select(col("doc_id")), "doc_id")
      val s2 = stage2(docs.filter(col("doc_id") <= cut),
        s1fp.select(col("doc_id"))).localCheckpoint()
      // delta ladder
      val i1 = delta
        .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("_fp"))
        .groupBy(col("_fp")).agg(min(col("doc_id")).as("doc_id"))
        .join(s1fp.select(col("_fp")), Seq("_fp"), "left_anti")
        .select(col("doc_id"))
        .localCheckpoint()
      val d1 = docs.join(i1, "doc_id")
      val covI = ExactSubstr.incrementalDupSpans(s1Docs, d1,
          "doc_id", "text", K, MinTok)
        .groupBy(col("doc").as("doc_id")).agg(sum(col("len")).as("_dup"))
      val i2 = d1.select(col("doc_id"),
          size(TextFunctions.lowerTokens(col("text"))).as("_n"))
        .join(covI, Seq("doc_id"), "left")
        .filter(coalesce(col("_dup"), lit(0L)) * 2 < col("_n"))
        .select(col("doc_id"))
        .localCheckpoint()
      val histIdx = Dedup.bandIndex(docs.join(s2, "doc_id"),
        "text", "doc_id", k = 8, bands = 4)
      val i3 = Dedup.incrementalNearDup(histIdx, docs.join(i2, "doc_id"),
          "text", "doc_id", Jac, k = 8, bands = 4)
        .filter(!col("is_dup"))
        .select(col("id").as("doc_id"))
        .localCheckpoint()
      val i4 = stage4(docs, i3)

      val i = Seq(ids(i1), ids(i2), ids(i3), ids(i4))
      if (i != b)
        println(s"[CurationProps] incremental law broke: incr=$i batch|delta=$b cut=$cut")
      i == b
    }
}
