package graft.operators

import org.apache.spark.sql.DataFrame
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
      // LAG change detection; LAG is NULL on the first row and the
      // null-comparison falls through to "changed", opening streak 1 —
      // same null choreography as the reference SQL.
      .withColumn("_changed",
        when(col(attr) === lag(col(attr), 1).over(byEntity), 0).otherwise(1))
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
    val open = scd.filter(col(endCol) === newOrdinal - 1)
    val closed = scd.filter(col(endCol) =!= newOrdinal - 1)

    val t = today.select(col(entity).as("t_entity"), col(attr).as("t_attr"))
    val joined = open.join(t, col(entity) === col("t_entity"), "full_outer")

    val bothSides = col(entity).isNotNull && col("t_entity").isNotNull
    // unchanged: attribute equal → extend the open period through today
    val extended = joined
      .filter(bothSides && col(attr) === col("t_attr"))
      .select(col(entity), col(attr), col(startCol),
        lit(newOrdinal).as(endCol))
    // changed: keep the old period closed at newOrdinal-1 and open a
    // fresh one. NULL-safe inequality (reference P8 IS DISTINCT FROM)
    // so a NULL attribute still registers as a change.
    val changed = joined.filter(bothSides && !(col(attr) <=> col("t_attr")))
    val changedOld =
      changed.select(col(entity), col(attr), col(startCol), col(endCol))
    val changedNew = changed.select(
      col("t_entity").as(entity), col("t_attr").as(attr),
      lit(newOrdinal).as(startCol), lit(newOrdinal).as(endCol))
    // retired: entity absent today → its open period stays closed
    val retired = joined
      .filter(col("t_entity").isNull)
      .select(col(entity), col(attr), col(startCol), col(endCol))
    // brand-new entities seen for the first time today
    val fresh = joined
      .filter(col(entity).isNull)
      .select(col("t_entity").as(entity), col("t_attr").as(attr),
        lit(newOrdinal).as(startCol), lit(newOrdinal).as(endCol))

    closed.select(col(entity), col(attr), col(startCol), col(endCol))
      .unionByName(extended)
      .unionByName(changedOld)
      .unionByName(changedNew)
      .unionByName(retired)
      .unionByName(fresh)
  }
}
