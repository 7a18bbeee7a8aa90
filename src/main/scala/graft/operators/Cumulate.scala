package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The cumulation kernel: yesterday ⟗ today with COALESCE'd keys
  * (reference J3, the backbone of every module-1/2 pipeline:
  * `pipeline_query.sql:40-42`, `user_cumulated_populate.sql:24-26`,
  * `growth_accounting.sql:44-46`).
  *
  * Scale: a full outer join on the entity key — one shuffle of each
  * side. The daily "today" increment is small relative to the
  * cumulated snapshot; writing the snapshot bucketed by the key makes
  * the next day's merge shuffle-free on the big side.
  */
object Cumulate {

  /** One merged output column: a name and an expression over the
    * joined row, where yesterday's columns appear as `y_<col>` and
    * today's as `t_<col>` (either side NULL for one-sided rows).
    */
  final case class MergeCol(name: String, merged: Column)

  /** Full-outer merge of two snapshots on `keys`.
    *
    * Both inputs are prefixed (`y_` / `t_`) before the join, so merge
    * expressions address them unambiguously even when the two sides
    * share a schema. Output: the coalesced keys plus one column per
    * MergeCol.
    */
  def fullOuterMerge(yesterday: DataFrame, today: DataFrame,
      keys: Seq[String], cols: Seq[MergeCol]): DataFrame = {
    val y = yesterday.columns.foldLeft(yesterday)(
      (d, c) => d.withColumnRenamed(c, s"y_$c"))
    val t = today.columns.foldLeft(today)(
      (d, c) => d.withColumnRenamed(c, s"t_$c"))
    val cond = keys.map(k => col(s"y_$k") <=> col(s"t_$k"))
      .reduce(_ && _)
    val joined = y.join(t, cond, "full_outer")
    val keyCols =
      keys.map(k => coalesce(col(s"y_$k"), col(s"t_$k")).as(k))
    val valCols = cols.map(m => m.merged.as(m.name))
    joined.select(keyCols ++ valCols: _*)
  }

  /** The dates_active cumulation (reference
    * `user_cumulated_populate.sql:16-22`): append today's date to the
    * carried array, seeding with an empty typed array — never NULL —
    * for first-time entities.
    */
  def appendDate(yDates: Column, tDate: Column): Column =
    when(tDate.isNull, coalesce(yDates, array().cast("array<date>")))
      .otherwise(concat(coalesce(yDates, array().cast("array<date>")),
        array(tDate)))
}
