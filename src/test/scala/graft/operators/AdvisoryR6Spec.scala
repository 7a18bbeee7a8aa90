package graft.operators

import graft.SparkSpec

/** Pins the round-6 advisory fixes (ADVICE.md r6): each test fails
  * against the pre-fix behavior.
  *
  *  1. RankEval F1 key in BigInt — the sweep survives TP beyond the
  *     old `Long.MaxValue / 10¹²` require (~4.6M).
  *  2. Bootstrap.meanCi excludes null-valued rows from the point
  *     estimate AND the resample universe (no silent skew).
  *  3. Calibrate score_lo is the smallest score actually mapping to
  *     its bin (ceiling, not floor, of b·width/B).
  *  4. Sampling.allocateLargestRemainder raises an actionable message
  *     on budget·mass overflow instead of a mid-plan
  *     ARITHMETIC_OVERFLOW.
  *  5. Similarity.labelConsistency drops zero-norm vectors, whose NaN
  *     cosine would rank FIRST in the cos-desc top-k.
  */
class AdvisoryR6Spec extends SparkSpec {
  import spark.implicits._

  test("RankEval: F1 sweep survives tp past the old Long·10¹² bound") {
    // 4.7M all-positive rows: tp at the best threshold exceeds the
    // pre-fix require (Long.MaxValue / 10¹² ≈ 4.61M) — the old code
    // aborted here; the BigInt key just works
    val df = spark.range(4_700_000L)
      .selectExpr("id % 3 AS score", "1L AS y")
    val Seq((n, nPos, nNeg, aucBp, bestT, tp, fp, fn, f1Bp)) =
      RankEval.aucAndBestF1(df, "score", "y")
        .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
        .collect().toSeq
    assert(n == 4_700_000L && nPos == n && nNeg == 0L)
    assert(aucBp == -1L) // one class absent → undefined
    // predicting positive at the smallest threshold captures all
    assert(bestT == 0L && tp == n && fp == 0L && fn == 0L)
    assert(f1Bp == 10000L)
  }

  test("Bootstrap.meanCi: null values excluded from n, mean_v, and " +
    "the resample universe") {
    val withNulls = Seq(
      (1L, Option(10L)), (2L, None), (3L, Option(20L)),
      (4L, Option(30L)), (5L, None)).toDF("id", "v")
    val ci = Bootstrap.meanCi(withNulls, "id", "v",
      reps = 8, loRank = 1, hiRank = 8)
    assertDfEquality(ci,
      Bootstrap.meanCi(withNulls.filter($"v".isNotNull), "id", "v",
        reps = 8, loRank = 1, hiRank = 8))
    val row = ci.as[(Long, Double, Double, Double)].head()
    assert(row._1 == 3L && row._2 == 20.0)
  }

  test("Calibrate: score_lo is the smallest score in its bin when " +
    "width is not a multiple of nBins") {
    // scores 0..9, 4 bins: (s·4) div 10 → bins {0,1,2}=0, {3,4}=1,
    // {5,6,7}=2, {8,9}=3; the floor formula labeled bin 1 with
    // score 2, which belongs to bin 0
    val df = (0L to 9L).map(s => (s, s % 2)).toDF("score", "y")
    val out = Calibrate.isotonicBins(df, "score", "y", 4)
      .select("bin", "score_lo").as[(Long, Long)].collect().toSeq
      .sortBy(_._1)
    assert(out == Seq((0L, 0L), (1L, 3L), (2L, 5L), (3L, 8L)))
    // the binning invariant itself: score_lo maps back to its bin
    out.foreach { case (b, sl) =>
      assert(sl * 4 / 10 == b, s"score_lo $sl not in bin $b")
      if (sl > 0) assert((sl - 1) * 4 / 10 == b - 1,
        s"score_lo $sl is not the smallest score of bin $b")
    }
  }

  test("Sampling.allocateLargestRemainder: budget·mass overflow " +
    "raises the actionable pre-scale message upfront") {
    val counts = Seq(("a", Long.MaxValue / 2), ("b", 5L))
      .toDF("stratum", "mass")
    val ex = intercept[IllegalArgumentException] {
      Sampling.allocateLargestRemainder(counts, Seq("stratum"), "mass",
        budget = 3L)
    }
    assert(ex.getMessage.contains("pre-scale"))
    // the guarded path still allocates: same strata, sane masses
    val ok = Sampling.allocateLargestRemainder(
        Seq(("a", 10L), ("b", 5L)).toDF("stratum", "mass"),
        Seq("stratum"), "mass", budget = 3L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(ok("a") + ok("b") == 3L)
  }

  test("Similarity.labelConsistency: zero-norm vectors neither score " +
    "nor displace real neighbors") {
    // 1,2,3 exactly parallel → same SRP bucket, pairwise cosine 1.0
    // (ties break on nb_id); 4 is the zero vector whose NaN cosine
    // used to rank first
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f), "x"),
      (2L, Array(2f, 0f, 0f, 0f), "x"),
      (3L, Array(3f, 0f, 0f, 0f), "y"),
      (4L, Array(0f, 0f, 0f, 0f), "y")
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity
      .labelConsistency(vecs, Similarity.planes(2, 4), k = 2)
      .as[(Long, String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((1L, "x", 2L, 1L), (2L, "x", 2L, 1L),
      (3L, "y", 2L, 0L)))
  }
}
