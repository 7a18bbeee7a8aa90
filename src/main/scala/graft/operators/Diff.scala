package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — change-data-capture between two states of the same
  * keyed table: every key classified as added / removed / changed /
  * unchanged, with attribute comparison null-safe (NULL→value and
  * value→NULL both count as changes, NULL→NULL does not).
  *
  * One full outer join on the key — the same single-pass discipline as
  * [[Scd.incremental]]: no per-class filtered re-reads. At scale both
  * snapshots shuffle-partition on the key once; the classifier is a
  * per-row expression.
  */
object Diff {

  /** @param before earlier snapshot
    * @param after  later snapshot (same schema)
    * @param keys   identifying key columns
    * @return one row per key present in either side: key columns,
    *         `change_type`, plus each non-key column as
    *         `<col>_before` / `<col>_after`
    */
  def snapshotDiff(before: DataFrame, after: DataFrame,
      keys: Seq[String]): DataFrame = {
    val attrs = before.columns.filterNot(keys.contains).toSeq
    require(attrs == after.columns.filterNot(keys.contains).toSeq,
      "snapshots must share a schema")
    // explicit per-side presence markers: key-nullability probing
    // would misclassify rows whose first key column is legitimately
    // NULL (a NULL-keyed after-only row must still read as "added")
    val b = before.select(
      keys.map(k => col(k).as(s"_bk_$k")) ++
        attrs.map(a => col(a).as(s"${a}_before")) :+
        lit(true).as("_in_before"): _*)
    val a = after.select(
      keys.map(k => col(k).as(s"_ak_$k")) ++
        attrs.map(c => col(c).as(s"${c}_after")) :+
        lit(true).as("_in_after"): _*)
    // NULL-SAFE key equality: the presence markers exist precisely so
    // NULL-keyed rows classify correctly, and a null-rejecting ===
    // would undo that by never matching them (a NULL-keyed row in
    // both snapshots must read as one unchanged/changed row, not as
    // removed + added) — same kernel as Cumulate.fullOuterMerge
    val cond = keys.map(k => col(s"_bk_$k") <=> col(s"_ak_$k"))
      .reduce(_ && _)
    val inBefore = col("_in_before").isNotNull
    val inAfter = col("_in_after").isNotNull
    val allEqual: Column = attrs
      .map(c => col(s"${c}_before") <=> col(s"${c}_after"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val changeType =
      when(inBefore && inAfter && allEqual, "unchanged")
        .when(inBefore && inAfter, "changed")
        .when(inAfter, "added")
        .otherwise("removed")
    a.join(b, cond, "full_outer")
      .select(
        keys.map(k =>
          coalesce(col(s"_ak_$k"), col(s"_bk_$k")).as(k)) ++
          Seq(changeType.as("change_type")) ++
          attrs.flatMap(c =>
            Seq(col(s"${c}_before"), col(s"${c}_after"))): _*)
  }
}
