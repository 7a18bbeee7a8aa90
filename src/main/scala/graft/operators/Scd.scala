package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) operators.
  *
  * Semantics from the reference's SCD lab
  * (`1-dimensional-data-modeling/lecture-lab/scd_generation_query.sql:5-29`
  * backfill; `incremental_scd_query.sql:10-110` incremental): one input
  * row per (entity, ordinal) carrying a tracked attribute; output one
  * row per unbroken streak of identical attribute values, as
  * [entity, attribute, start_ordinal, end_ordinal].
  *
  * Scale: the backfill is two window passes + one aggregation, all
  * partitioned by the entity key — a single hash shuffle on `entity`
  * feeds every step (Catalyst reuses the exchange since the partition
  * keys align). No driver-side iteration; streak detection is pure
  * lag + running-sum, the W1+W3 pattern.
  */
object Scd {

  /** Backfill: derive full SCD history from per-ordinal snapshots.
    *
    * @param df      one row per (entity, ordinal)
    * @param entity  entity key column name
    * @param ordinal ordering column name (season, day, …)
    * @param attr    tracked attribute column name
    */
  def backfill(df: DataFrame, entity: String, ordinal: String,
      attr: String): DataFrame = {
    val byEntity = Window.partitionBy(col(entity)).orderBy(col(ordinal))
    val runningFrame =
      byEntity.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      // LAG change detection with NULL-SAFE equality (reference P8,
      // IS DISTINCT FROM): a run of NULL attribute values is ONE
      // period, not one per ordinal — plain === would evaluate
      // NULL===NULL to NULL and fragment it. The first row still
      // opens streak 1: its lag is a missing value, and NULL <=>
      // non-NULL is false (a first-row NULL attr matches NULL <=>
      // NULL = true, but sum-over-zero still labels the streak — the
      // groupBy keys on the streak id, so the first period is intact
      // either way).
      .withColumn("_changed",
        when(col(attr) <=> lag(col(attr), 1).over(byEntity), 0)
          .otherwise(1))
      .withColumn("_streak", sum(col("_changed")).over(runningFrame))
      .groupBy(col(entity), col(attr), col("_streak"))
      .agg(
        min(col(ordinal)).as(s"start_$ordinal"),
        max(col(ordinal)).as(s"end_$ordinal"))
      .drop("_streak")
  }

  /** Incremental merge: fold one new ordinal of snapshots into an
    * existing SCD table (the reference's 4-way UNION:
    * historical ∪ unchanged-extended ∪ changed ∪ brand-new,
    * `incremental_scd_query.sql:92-110`).
    *
    * Invariant (property-tested): `incremental(backfill(hist), today)`
    * equals `backfill(hist ∪ today)` for integer ordinals where open
    * periods end at `newOrdinal - 1`.
    *
    * @param scd        existing history: entity, attr, start_X, end_X
    * @param today      new snapshot rows: (entity, attr) at newOrdinal
    * @param newOrdinal the ordinal being folded in
    */
  def incremental(scd: DataFrame, today: DataFrame, entity: String,
      ordinal: String, attr: String, newOrdinal: Int): DataFrame = {
    val startCol = s"start_$ordinal"
    val endCol = s"end_$ordinal"
    // Single pass instead of the reference's literal 4-way UNION of
    // filtered re-reads: union branches each re-execute their whole
    // upstream (Catalyst shares no subtrees across a Union), so the
    // history scan+join would run once per branch. Here the open-period
    // test rides inside the join condition — closed periods simply
    // never match and pass through as left-only rows (identical
    // projection to "retired") — and each joined row emits its 1-2
    // output periods via one explode. History is read exactly once.
    val t = today.select(col(entity).as("t_entity"), col(attr).as("t_attr"))
    val joined = scd.join(t,
      col(entity) === col("t_entity") && col(endCol) === newOrdinal - 1,
      "full_outer")
    val bothSides = col(entity).isNotNull && col("t_entity").isNotNull
    def row(e: Column, a: Column, s: Column, en: Column) =
      struct(e.as(entity), a.as(attr), s.as(startCol), en.as(endCol))
    val oldRow =
      row(col(entity), col(attr), col(startCol), col(endCol))
    val newRow = row(col("t_entity"), col("t_attr"),
      lit(newOrdinal), lit(newOrdinal))
    val out =
      // unchanged: attribute NULL-SAFELY equal (reference P8, IS NOT
      // DISTINCT FROM — a NULL attr staying NULL extends the period,
      // it is not a change) → extend the open period through today
      when(bothSides && (col(attr) <=> col("t_attr")),
        array(row(col(entity), col(attr), col(startCol),
          lit(newOrdinal))))
      // changed: close the old period, open a fresh one. Reaching
      // here means attrs are DISTINCT (including NULL vs non-NULL,
      // but never NULL vs NULL — that matched above).
      .when(bothSides, array(oldRow, newRow))
      // left-only: a closed period, or an open one whose entity is
      // absent today (retired) — either way the row passes through
      .when(col("t_entity").isNull, array(oldRow))
      // right-only: brand-new entity seen for the first time today
      .otherwise(array(newRow))
    // explode_outer + attribute select: the _outer variant stops the
    // optimizer inferring a size(out)>0 filter that would re-evaluate
    // the computed array twice (see PLANS.md)
    joined.select(explode_outer(out).as("_r")).select(col("_r.*"))
  }
}
