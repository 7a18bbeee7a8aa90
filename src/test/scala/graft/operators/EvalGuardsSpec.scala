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
}
