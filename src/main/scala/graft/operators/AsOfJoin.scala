package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the most recent right row with
  * `rightTs <= leftTs` on the same key — the time-series enrichment
  * join (generalizes the reference's time-ordered funnel self-join J7,
  * `funnel_analysis.sql:17-21`).
  *
  * Spark-first implementation: instead of a range join (which plans as
  * a nested-loop explosion) or per-left subqueries, both sides are
  * UNIONED, tagged, and sorted once per key; a `last_value(…, ignore
  * nulls)` running window carries the latest right payload forward
  * onto each left row. Exactly ONE shuffle on the key, state bounded
  * by a single row — this is the 100 TB-safe shape.
  *
  * Right rows must be unique per (key, ts) — pre-dedup for a
  * deterministic pick (ASOF tie semantics are engine-arbitrary
  * otherwise).
  */
object AsOfJoin {

  /** @param tolerance optional max staleness: a prior right row older
    *        than `leftTs - tolerance` yields a NULL `asof` (the
    *        feature-store freshness bound — a stale feature must read
    *        as missing, not silently joined). Any type with `-`
    *        against the ts works: a long µs literal for numeric ts, an
    *        interval for timestamps. Monotonicity makes the single
    *        last-prior check sufficient: if the LATEST prior row is
    *        stale, every earlier one is staler.
    * @return all left columns + `asof` STRUCT column (null when no
    *         prior right row exists). Right rows at exactly leftTs DO
    *         match (`<=` semantics).
    */
  def lastPrior(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTs: Column, rightTs: Column,
      tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toIndexedSeq
    val l = left.select(
      leftKey.as("_k"), leftTs.as("_ts"), lit(1).as("_side"),
      struct(leftCols.map(col): _*).as("_l"),
      lit(null).cast(structType(right)).as("_r"))
    val r = right.select(
      rightKey.as("_k"), rightTs.as("_ts"), lit(0).as("_side"),
      lit(null).cast(structType(left)).as("_l"),
      struct(right.columns.toIndexedSeq.map(col): _*).as("_r"))
    // right sorts before left at equal ts (side 0 < 1) → `<=` matching
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .withColumn("_asof_ts",
        last(when(col("_side") === 0, col("_ts")), ignoreNulls = true)
          .over(w))
      .filter(col("_side") === 1)
    val asof = tolerance match {
      case Some(tol) =>
        when(col("_asof_ts") >= col("_ts") - tol, col("_asof"))
      case None => col("_asof")
    }
    joined.select(leftCols.map(c => col(s"_l.$c").as(c)) :+
      asof.as("asof"): _*)
  }

  private def structType(df: DataFrame) =
    org.apache.spark.sql.types.StructType(df.schema.fields)
}
