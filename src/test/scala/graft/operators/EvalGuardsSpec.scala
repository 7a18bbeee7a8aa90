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
