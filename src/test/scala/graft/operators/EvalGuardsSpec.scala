package graft.operators

import graft.SparkSpec

/** Empty-input contracts for the evaluation operators: an empty
  * corpus yields an EMPTY result frame with the documented schema —
  * never a crash — matching Calibrate.isotonicBins' existing guard.
  */
class EvalGuardsSpec extends SparkSpec {
  import spark.implicits._

  private val noRows = Seq.empty[(Long, Long)].toDF("score", "y")

  test("RankEval, Association, Bootstrap, and Calibrate all return " +
    "empty frames on empty input") {
    val auc = RankEval.aucAndBestF1(noRows, "score", "y")
    assert(auc.count() == 0 && auc.columns.toSeq == Seq("n", "n_pos",
      "n_neg", "auc_bp", "best_t", "tp", "fp", "fn", "f1_bp"))
    val strs = Seq.empty[(String, String)].toDF("a", "b")
    val kap = Association.cohensKappa(strs, "a", "b")
    assert(kap.count() == 0 && kap.columns.toSeq == Seq("n", "n_agree",
      "po_bp", "pe_bp", "kappa_num", "kappa_den"))
    val chi = Association.chiSquareMilli(strs, "a", "b")
    assert(chi.count() == 0 &&
      chi.columns.toSeq == Seq("n", "cells", "dof", "chi2_milli"))
    val ci = Bootstrap.meanCi(noRows.withColumnRenamed("score", "id"),
      "id", "y", reps = 4, loRank = 1, hiRank = 4)
    assert(ci.count() == 0 &&
      ci.columns.toSeq == Seq("n", "mean_v", "ci_lo", "ci_hi"))
    val cal = Calibrate.isotonicBins(noRows, "score", "y", 8)
    assert(cal.count() == 0 && cal.columns.toSeq == Seq("bin",
      "score_lo", "n", "pos", "raw_bp", "cal_bp"))
  }

  test("aucAndBestF1's bounded-regime guard fires LOUDLY on a " +
    "high-cardinality score column instead of collecting it (r9 " +
    "verdict item 5)") {
    import org.apache.spark.sql.functions._
    // 300k distinct scores — past the 262144 cap; the guard must
    // throw a named IllegalArgumentException, never OOM or succeed
    val wide = spark.range(300000)
      .select(col("id").as("score"), (col("id") % 2).as("y"))
    val e = intercept[IllegalArgumentException] {
      RankEval.aucAndBestF1(wide, "score", "y").collect()
    }
    assert(e.getMessage.contains("distinct values"),
      s"wrong failure: ${e.getMessage}")
    // and the bounded regime still computes: same data quantized to
    // 1001 score values passes through the identical path
    val bounded = wide.select((col("score") % 1001).as("score"), col("y"))
    assert(RankEval.aucAndBestF1(bounded, "score", "y").count() == 1)
  }

  test("kCenterGreedy rejects duplicate ids loudly (r9 advisory: a " +
    "duplicated id makes the seed nondeterministic and silently " +
    "shrinks the candidate pool)") {
    val dup = Seq((1L, Seq(0L, 0L)), (1L, Seq(9L, 9L)),
      (2L, Seq(3L, 3L))).toDF("vec_id", "codes")
    val e = intercept[IllegalArgumentException] {
      Coreset.kCenterGreedy(dup, "vec_id", "codes", 2).collect()
    }
    assert(e.getMessage.contains("unique"), s"wrong failure: ${e.getMessage}")
    val ok = Seq((1L, Seq(0L, 0L)), (2L, Seq(9L, 9L)))
      .toDF("vec_id", "codes")
    assert(Coreset.kCenterGreedy(ok, "vec_id", "codes", 2).count() == 2)
  }

  test("fleissKappa rejects NULL ratings loudly (missing ratings are " +
    "krippendorffAlpha's contract, never a silent category)") {
    val df = Seq((1L, Some("a"), Some("a")), (2L, Some("b"), None))
      .toDF("item", "r1", "r2")
    val e = intercept[Exception] {
      Association.fleissKappa(df, "item", Seq("r1", "r2")).collect()
    }
    assert(e.getMessage.contains("NULL rating") ||
      Option(e.getCause).exists(_.getMessage.contains("NULL rating")),
      s"wanted the NULL-rating contract error, got: ${e.getMessage}")
  }

  test("fleissKappa rejects duplicate item rows loudly (they break " +
    "the N*n invariant)") {
    val df = Seq((1L, "a", "b"), (1L, "a", "a"), (2L, "b", "b"))
      .toDF("item", "r1", "r2")
    val e = intercept[Exception] {
      Association.fleissKappa(df, "item", Seq("r1", "r2")).collect()
    }
    assert(e.getMessage.contains("N*n invariant") ||
      Option(e.getCause).exists(_.getMessage.contains("N*n invariant")),
      s"wanted the N*n invariant error, got: ${e.getMessage}")
  }

  test("fleissKappa still computes exactly on clean input") {
    val df = Seq((1L, "a", "a"), (2L, "a", "b"), (3L, "b", "b"))
      .toDF("item", "r1", "r2")
    val row = Association.fleissKappa(df, "item", Seq("r1", "r2"))
      .collect().head
    assert(row.getAs[Long]("n_items") == 3 &&
      row.getAs[Long]("n_raters") == 2)
  }

  test("spearmanKendall's grid guard fires BEFORE an unbounded " +
    "collect (the fetch is capped at the grid size + 1)") {
    // 300 distinct x values on one axis: > MaxAxis, must fail loudly
    val df = spark.range(300).selectExpr("id AS x", "id AS y")
    val e = intercept[IllegalArgumentException] {
      RankCorr.spearmanKendall(df, "x", "y")
    }
    assert(e.getMessage.contains("quantize first"))
  }
}
