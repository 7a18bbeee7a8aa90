package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact ranking-evaluation metrics for a scored binary outcome — the
  * measurement companion to [[Calibrate]]: AUC says whether the score
  * RANKS positives above negatives at all, the F1 sweep picks the
  * operating threshold, and the isotonic fit (q244) makes the scores
  * between those two readable as probabilities.
  *
  * Both metrics reduce over the PER-SCORE table (one row per distinct
  * integer score — bounded by the score's construction, e.g. ≤ 10001
  * basis-point values), so the corpus is touched once by a count/
  * positive aggregate and everything after runs on the collected
  * bounded rows — the [[Percentiles]] offsets-regime discipline
  * (bounded driver state by construction), no corpus funnel.
  *
  * Exactness:
  *  - AUC is the Mann–Whitney statistic with midrank ties, carried as
  *    2·Σranks (so midranks stay integral: a tie block over positions
  *    (c, c+cnt] has 2·midrank = 2c + cnt + 1); the final basis-point
  *    division happens in BigInt on three collected longs — no
  *    overflow at any corpus size, no doubles anywhere.
  *  - The F1 argmax compares candidate thresholds by the QUANTIZED
  *    integer key `(2TP·10¹²) div (2TP+FP+FN)` with a smallest-
  *    threshold tie-break — both engines rank identical integers, so
  *    the chosen threshold cannot diverge at near-ties the way a
  *    double F1 sort could (ties closer than 10⁻¹² resolve to the
  *    smaller threshold, deterministically). The key is carried in
  *    BigInt (like `sum2Ranks`), so 2TP·10¹² cannot overflow at any
  *    corpus size — the oracle mirrors this with a HUGEINT cast.
  */
object RankEval {

  /** One-row frame: `n, n_pos, n_neg, auc_bp, best_t, tp, fp, fn,
    * f1_bp`. `labelCol` must be 0/1; `scoreCol` integral with
    * bounded cardinality ("predict positive when score ≥ t").
    */
  def aucAndBestF1(df: DataFrame, scoreCol: String, labelCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the only corpus-sized work: one map-side-combined aggregate;
    // everything below runs on the bounded per-score rows (collected —
    // the Percentiles offsets-regime discipline, bounded by the score
    // construction, so no single-partition window is needed at all)
    // loud bounded-regime guard (the Percentiles discipline): the
    // collect is sized by DISTINCT scores, which the caller promises
    // is bounded (basis-point scores ≤ 10001 values). A raw
    // high-cardinality score column must fail with a named error, not
    // OOM the driver — limit(cap+1) bounds what ever reaches the
    // driver, and the cap+1'th row proves the contract was broken.
    val cap = 262144
    val rows0 = df
      .select(col(scoreCol).cast("long").as("s"),
        col(labelCol).cast("long").as("y"))
      .groupBy($"s")
      .agg(count(lit(1)).as("cnt"), sum($"y").as("pos"))
      .limit(cap + 1)
      .as[(Long, Long, Long)].collect()
    require(rows0.length <= cap,
      s"aucAndBestF1: more than $cap distinct values in '$scoreCol' — " +
        "this operator's driver state is sized by distinct scores " +
        "(quantize the score, e.g. to basis points, or use the fully " +
        "distributed groupedAuc path)")
    val rows = rows0.sortBy(_._1) // (s, cnt, pos) ascending score
    if (rows.isEmpty)
      return Seq
        .empty[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
        .toDF("n", "n_pos", "n_neg", "auc_bp", "best_t", "tp", "fp",
          "fn", "f1_bp")
    val n = rows.map(_._2).sum
    val nPos = rows.map(_._3).sum
    val nNeg = n - nPos
    // 2·Σ(midranks of positives): tie block over (c, c+cnt] gives
    // each member 2·midrank = 2c + cnt + 1
    val sum2Ranks = rows
      .scanLeft((0L, (0L, 0L))) { case ((c, _), (_, cnt, pos)) =>
        (c + cnt, (cnt, pos))
      }.drop(1)
      .zip(rows)
      .map { case ((cAfter, (cnt, pos)), _) =>
        BigInt(pos) * (2 * BigInt(cAfter - cnt) + cnt + 1)
      }.sum
    val aucBp =
      if (nPos == 0 || nNeg == 0) -1L // undefined: one class absent
      else ((sum2Ranks - BigInt(nPos) * (nPos + 1)) * 10000 /
        (2 * BigInt(nPos) * nNeg)).toLong
    // threshold sweep from the high end: suffix sums of (cnt, pos)
    val best = rows.reverse
      .scanLeft((0L, 0L, 0L)) { case ((tp, pp, _), (s, cnt, pos)) =>
        (tp + pos, pp + cnt, s)
      }.drop(1)
      .map { case (tp, predPos, s) =>
        val fp = predPos - tp
        val fn = nPos - tp
        val denom = 2 * tp + fp + fn
        // BigInt like sum2Ranks: 2TP·10¹² exceeds Long once TP passes
        // ~4.6M, well inside the corpus scales this module targets
        val key =
          if (denom == 0) BigInt(0)
          else BigInt(2) * tp * 1_000_000_000_000L / denom
        (key, s, tp, fp, fn, denom)
      }.sortBy { case (key, s, _, _, _, _) => (-key, s) }.head
    val (_, bestT, tp, fp, fn, denom) = best
    val f1Bp =
      if (denom == 0) 0L else (BigInt(10000) * 2 * tp / denom).toLong
    Seq((n, nPos, nNeg, aucBp, bestT, tp, fp, fn, f1Bp))
      .toDF("n", "n_pos", "n_neg", "auc_bp", "best_t", "tp", "fp",
        "fn", "f1_bp")
  }

  /** Per-group AUC, FULLY distributed — the sliced form of
    * [[aucAndBestF1]] with no driver state at all: when the slicing
    * key has thousands of values (source, language, date), the bounded
    * -collect discipline would still be fine per group but pointless
    * overall; instead the per-(group, score) table (bounded by
    * |groups| × |distinct scores|, NOT by rows) carries the whole
    * computation through windows PARTITIONED BY the group — the same
    * midrank identity as [[aucAndBestF1]] (tie block over (c, c+cnt]
    * has 2·midrank = 2c + cnt + 1), the same integer exactness, but
    * every group's rank scan runs where its rows live.
    *
    * Overflow: `pos·(2c+cnt+1)` is ≲ 2n² per group, past Long at
    * n ≈ 2³¹ rows per group — so the Σ2ranks sum is carried as
    * decimal(38,0) (the oracle mirrors with HUGEINT) and the final
    * basis-point ratio divides there before casting back to BIGINT.
    *
    * @return one row per group: `<groupCol>, n, n_pos, n_neg, auc_bp`
    *         (`auc_bp = -1` when a group has one class only, matching
    *         [[aucAndBestF1]]).
    */
  def groupAuc(df: DataFrame, groupCol: String, scoreCol: String,
      labelCol: String): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val ps = df
      .select(col(groupCol).as("_g"),
        col(scoreCol).cast("long").as("s"),
        col(labelCol).cast("long").as("y"))
      .groupBy($"_g", $"s")
      .agg(count(lit(1)).as("cnt"), sum($"y").as("pos"))
    val wAsc = Window.partitionBy($"_g").orderBy($"s")
      .rowsBetween(Window.unboundedPreceding, -1)
    ps
      .withColumn("c", coalesce(sum($"cnt").over(wAsc), lit(0L)))
      .groupBy($"_g")
      .agg(
        sum($"cnt").as("n"),
        sum($"pos").as("np"),
        sum(($"pos".cast("decimal(38,0)") *
          (lit(2) * $"c" + $"cnt" + lit(1)))).as("s2r"))
      .select(
        $"_g".as(groupCol),
        $"n",
        $"np".as("n_pos"),
        ($"n" - $"np").as("n_neg"),
        when($"np" === 0 || $"np" === $"n", lit(-1L))
          .otherwise(expr(
            """CAST(((s2r - CAST(np AS DECIMAL(38,0)) * (np + 1))
              |  * 10000)
              |  DIV (2 * CAST(np AS DECIMAL(38,0)) * (n - np))
              |  AS BIGINT)""".stripMargin)).as("auc_bp"))
  }
}
