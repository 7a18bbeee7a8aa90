package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Categorical association metrics over BOUNDED contingency tables —
  * the dataset-audit questions "does the automatic labeler agree with
  * the annotations" (Cohen's κ) and "is corpus composition independent
  * of source" (χ² independence), computed exactly in integers so both
  * engines agree to the bit.
  *
  * Scale shape: the corpus is touched once by the (a, b) count
  * aggregate; everything else runs on the collected contingency cells
  * — bounded by the CATEGORY cross product (languages × sources, not
  * rows), the same bounded-collect discipline as [[RankEval]].
  *
  * Exactness:
  *  - κ's ratio ((po − pe)/(1 − pe)) can be negative, and integer
  *    division on negatives is where engines diverge (Spark `div`
  *    truncates toward zero, DuckDB `//` floors — the COVERAGE.md
  *    rule), so the operator never divides it: it emits the exact
  *    integer numerator N·agree − Σr·c and denominator N² − Σr·c
  *    (plus the non-negative po/pe basis points, where floor and
  *    truncate agree).
  *  - χ²'s per-cell term (O−E)²/E has no common integer denominator
  *    across cells, so each term is FLOORED at milli precision —
  *    `(1000·(O·N − r·c)²) div (N·r·c)`, all non-negative — and the
  *    floored integers sum exactly: both engines compute identical
  *    values, and the statistic is χ²·1000 with under one milli-unit
  *    error per cell (the q217–q219 quantize-then-sum discipline).
  *    Zero-observed cells contribute their full E mass — the grid is
  *    the category CROSS PRODUCT, not just the occupied cells.
  */
object Association {

  /** One row: `n, n_agree, po_bp, pe_bp, kappa_num, kappa_den`
    * (κ = kappa_num / kappa_den exactly).
    */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cells = df
      .groupBy(col(aCol).cast("string").as("a"),
        col(bCol).cast("string").as("b"))
      .agg(count(lit(1)).as("o"))
      .as[(String, String, Long)].collect()
    if (cells.isEmpty)
      return Seq.empty[(Long, Long, Long, Long, Long, Long)]
        .toDF("n", "n_agree", "po_bp", "pe_bp", "kappa_num",
          "kappa_den")
    val n = BigInt(cells.map(_._3).sum)
    val agree = BigInt(cells.collect { case (a, b, o) if a == b => o }.sum)
    val rowT = cells.groupBy(_._1).map { case (k, l) =>
      k -> BigInt(l.map(_._3).sum)
    }
    val colT = cells.groupBy(_._2).map { case (k, l) =>
      k -> BigInt(l.map(_._3).sum)
    }
    val peNum = rowT.map { case (k, r) =>
      r * colT.getOrElse(k, BigInt(0))
    }.sum
    Seq((n.toLong, agree.toLong,
        (agree * 10000 / n).toLong,
        (peNum * 10000 / (n * n)).toLong,
        (n * agree - peNum).toLong,
        (n * n - peNum).toLong))
      .toDF("n", "n_agree", "po_bp", "pe_bp", "kappa_num", "kappa_den")
  }

  /** One row: `n, cells, dof, chi2_milli` — the independence
    * statistic over the full category grid, quantized per cell at
    * milli precision (see object doc).
    */
  def chiSquareMilli(df: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val occupied = df
      .groupBy(col(aCol).cast("string").as("a"),
        col(bCol).cast("string").as("b"))
      .agg(count(lit(1)).as("o"))
      .as[(String, String, Long)].collect()
    if (occupied.isEmpty)
      return Seq.empty[(Long, Long, Long, Long)]
        .toDF("n", "cells", "dof", "chi2_milli")
    val n = BigInt(occupied.map(_._3).sum)
    val rowT = occupied.groupBy(_._1).view
      .mapValues(l => BigInt(l.map(_._3).sum)).toMap
    val colT = occupied.groupBy(_._2).view
      .mapValues(l => BigInt(l.map(_._3).sum)).toMap
    val oMap = occupied.map { case (a, b, o) => (a, b) -> BigInt(o) }.toMap
    val chi2 = (for {
      (a, r) <- rowT.toSeq
      (b, c) <- colT.toSeq
    } yield {
      val o = oMap.getOrElse((a, b), BigInt(0))
      val d = o * n - r * c
      1000 * d * d / (n * r * c)
    }).sum
    Seq((n.toLong, (rowT.size * colT.size).toLong,
        ((rowT.size - 1) * (colT.size - 1)).toLong,
        chi2.toLong))
      .toDF("n", "cells", "dof", "chi2_milli")
  }
}
