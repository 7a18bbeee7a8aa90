package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank correlation between two integer scores — "do my two quality
  * signals order the corpus the same way?" (e.g. a stopword-ratio
  * score vs a length score before combining them into one filter).
  * Spearman's ρ (Pearson on midranks) and Kendall's τ (concordance),
  * both tie-aware, both exact.
  *
  * Exactness (the [[RankEval]]/[[Association]] rules):
  *  - Midranks stay integral by carrying 2·midrank (a tie block over
  *    positions (c, c+cnt] has 2·midrank = 2c + cnt + 1); Pearson is
  *    invariant under positive affine rescaling, so ρ on the doubled
  *    ranks IS ρ on the ranks.
  *  - Both ρ and τ_b have square-root denominators (irrational), so
  *    the SIGNED SQUARE ships instead of the ratio:
  *    `rho2_signed_bp = sign(num) · (10⁴·num² div (varx·vary))` and
  *    `tau_b2_signed_bp = sign(C−D) · (10⁴·(C−D)² div
  *    ((n0−n1)(n0−n2)))` — exact integers both engines agree on (the
  *    inner division is non-negative, where floor and truncate
  *    coincide). τ_a needs no root: its exact fraction ships as
  *    `tau_a_num = C−D` over `pairs = n(n−1)/2` (possibly negative —
  *    never divided, the COVERAGE.md negative-division rule).
  *  - Raw pair counts (conc, disc, ties_x, ties_y, ties_xy) ship too;
  *    they satisfy conc + disc + ties = pairs exactly (a property-test
  *    invariant).
  *
  * Scale shape: the corpus is touched ONCE by the joint (x, y) count
  * aggregate; everything else runs on the collected contingency cells
  * — bounded by the QUANTIZED score grid (caller quantizes to ≤ 256
  * distinct values per axis; enforced), the [[Association]] bounded-
  * collect discipline. Concordant/discordant pairs come from dense 2-D
  * suffix sums over that grid — O(X·Y), never O(n²) over rows.
  */
object RankCorr {

  /** Max distinct values per score axis (keeps the dense grid and the
    * suffix-sum pass trivially driver-bounded: 256² = 65536 cells).
    */
  val MaxAxis = 256

  /** One row: `n, pairs, conc, disc, ties_x, ties_y, ties_xy,
    * tau_a_num, tau_b2_signed_bp, rho2_signed_bp`.
    *
    * @param df   input; `xCol`, `yCol` integral scores with ≤
    *             [[MaxAxis]] distinct values each (quantize first —
    *             e.g. `(score * 64) div 10001` for basis points).
    */
  def spearmanKendall(df: DataFrame, xCol: String, yCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Bounded collect: cap the fetch at MaxAxis²+1 rows so an
    // unquantized input (millions of distinct scores) fails the grid
    // guard loudly instead of OOMing the driver before it can fire.
    val cells = df
      .select(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .groupBy($"x", $"y")
      .agg(count(lit(1)).as("cnt"))
      .limit(MaxAxis * MaxAxis + 1)
      .as[(Long, Long, Long)].collect()
    require(cells.length <= MaxAxis * MaxAxis,
      s"spearmanKendall: quantize first — more than ${MaxAxis * MaxAxis} " +
        s"distinct (x, y) cells exceed the $MaxAxis-per-axis grid " +
        "bound (e.g. map basis points through (s * 64) div 10001)")
    if (cells.isEmpty)
      return Seq.empty[(Long, Long, Long, Long, Long, Long, Long,
          Long, Long, Long)]
        .toDF("n", "pairs", "conc", "disc", "ties_x", "ties_y",
          "ties_xy", "tau_a_num", "tau_b2_signed_bp",
          "rho2_signed_bp")
    val xs = cells.map(_._1).distinct.sorted
    val ys = cells.map(_._2).distinct.sorted
    require(xs.length <= MaxAxis && ys.length <= MaxAxis,
      s"spearmanKendall: quantize first — ${xs.length}×${ys.length} " +
        s"distinct (x, y) values exceed the $MaxAxis-per-axis grid " +
        "bound (e.g. map basis points through (s * 64) div 10001)")
    val xi = xs.zipWithIndex.toMap
    val yi = ys.zipWithIndex.toMap
    val grid = Array.ofDim[Long](xs.length, ys.length)
    cells.foreach { case (x, y, c) => grid(xi(x))(yi(y)) = c }
    val nx = grid.map(_.sum)
    val ny = ys.indices.map(j => xs.indices.map(grid(_)(j)).sum).toArray
    val n = BigInt(nx.sum)
    // inclusive suffix sums: suf(i)(j) = Σ_{k≥i, l≥j} grid(k)(l)
    // (borders at X/Y are zero), so
    //   #{k>i, l>j} = suf(i+1)(j+1)     — concordant partners
    //   #{k>i, l<j} = suf(i+1)(0) − suf(i+1)(j) — discordant partners
    val suf = Array.fill(xs.length + 1, ys.length + 1)(BigInt(0))
    for (i <- xs.length - 1 to 0 by -1; j <- ys.length - 1 to 0 by -1)
      suf(i)(j) = BigInt(grid(i)(j)) + suf(i + 1)(j) + suf(i)(j + 1) -
        suf(i + 1)(j + 1)
    var conc = BigInt(0)
    var disc = BigInt(0)
    for (i <- xs.indices; j <- ys.indices if grid(i)(j) != 0) {
      val c = BigInt(grid(i)(j))
      conc += c * suf(i + 1)(j + 1)
      disc += c * (suf(i + 1)(0) - suf(i + 1)(j))
    }
    val tiesX = nx.map(v => BigInt(v) * (v - 1) / 2).sum
    val tiesY = ny.map(v => BigInt(v) * (v - 1) / 2).sum
    val tiesXY = cells.map { case (_, _, c) => BigInt(c) * (c - 1) / 2 }
      .sum
    val pairs = n * (n - 1) / 2
    // Spearman on doubled midranks
    val u = cumMid(nx)
    val v = cumMid(ny)
    var su, sv, suu, svv, suv = BigInt(0)
    for (i <- xs.indices) { su += BigInt(nx(i)) * u(i);
      suu += BigInt(nx(i)) * u(i) * u(i) }
    for (j <- ys.indices) { sv += BigInt(ny(j)) * v(j);
      svv += BigInt(ny(j)) * v(j) * v(j) }
    for (i <- xs.indices; j <- ys.indices if grid(i)(j) != 0)
      suv += BigInt(grid(i)(j)) * u(i) * v(j)
    val num = n * suv - su * sv
    val varx = n * suu - su * su
    val vary = n * svv - sv * sv
    val rho2 = signedSquareBp(num, varx * vary)
    val tauDen = (pairs - tiesX) * (pairs - tiesY)
    val tau2 = signedSquareBp(conc - disc, tauDen)
    Seq((n.toLong, pairs.toLong, conc.toLong, disc.toLong,
        tiesX.toLong, tiesY.toLong, tiesXY.toLong,
        (conc - disc).toLong, tau2, rho2))
      .toDF("n", "pairs", "conc", "disc", "ties_x", "ties_y",
        "ties_xy", "tau_a_num", "tau_b2_signed_bp", "rho2_signed_bp")
  }

  /** sign(num) · (10⁴·num² div den); 0 when den = 0 (degenerate —
    * a constant axis has no ordering to correlate).
    */
  private def signedSquareBp(num: BigInt, den: BigInt): Long =
    if (den == 0) 0L
    else {
      val mag = num * num * 10000 / den
      (if (num < 0) -mag else mag).toLong
    }

  /** Doubled midranks per sorted distinct value: 2R = 2c + cnt + 1. */
  private def cumMid(counts: Array[Long]): Array[BigInt] = {
    val out = Array.ofDim[BigInt](counts.length)
    var c = BigInt(0)
    for (i <- counts.indices) {
      out(i) = 2 * c + counts(i) + 1
      c += counts(i)
    }
    out
  }
}
