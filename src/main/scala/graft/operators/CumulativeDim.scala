package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cumulative dimension tables with struct-array history — the
  * module-1 flagship (reference `players` table,
  * `1-dimensional-data-modeling/lecture-lab/players.sql:12-26` +
  * `pipeline_query.sql:9-43`): one row per entity carrying its full
  * per-ordinal history as ARRAY<STRUCT>, plus activity bookkeeping
  * (is_active, ordinals_since_last_active).
  *
  * Two build paths, same result (property: incremental ≡ direct):
  *  - [[direct]]: one shuffle — groupBy entity, ordered collect of the
  *    per-ordinal snapshot structs (the backfill);
  *  - [[increment]]: the daily/seasonal path — full-outer merge of the
  *    previous cumulated row with the new ordinal's snapshot, `||`
  *    appending to the carried array (reference
  *    `pipeline_query.sql:19-27`). At scale, yesterday's table is big
  *    and today's is small; write the snapshot bucketed by the entity
  *    key to make the merge shuffle-free on the big side.
  */
object CumulativeDim {

  /** Direct backfill: (entity, ordinal, payload struct) → one row per
    * entity with history sorted by ordinal.
    */
  def direct(df: DataFrame, entity: String, ordinal: String,
      payload: Column): DataFrame = {
    val maxOrdinal = df.agg(max(col(ordinal)).as("_cur")) // 1-row bcast
    df
      .groupBy(col(entity))
      .agg(
        array_sort(collect_list(struct(col(ordinal).as("_ord"),
          payload.as("_p")))).as("_hist"),
        max(col(ordinal)).as("_last"))
      .crossJoin(broadcast(maxOrdinal))
      .select(
        col(entity),
        transform(col("_hist"), h => h.getField("_p")).as("history"),
        col("_last").as("last_active"),
        (col("_cur") === col("_last")).as("is_active"),
        (col("_cur") - col("_last")).cast("int")
          .as("ordinals_since_last_active"))
  }

  /** Incremental fold: previous cumulated table + this ordinal's
    * snapshots → next cumulated table. `prev` must carry the output
    * schema of [[direct]]; `today` is (entity, payload) at `ordinal`.
    */
  def increment(prev: DataFrame, today: DataFrame, entity: String,
      payloadType: String, ordinal: Int): DataFrame =
    Cumulate.fullOuterMerge(prev, today, Seq(entity), Seq(
      Cumulate.MergeCol("history",
        when(col("t_payload").isNull, col("y_history"))
          .otherwise(concat(
            coalesce(col("y_history"),
              array().cast(s"array<$payloadType>")),
            array(col("t_payload"))))),
      Cumulate.MergeCol("last_active",
        when(col("t_payload").isNotNull, lit(ordinal))
          .otherwise(col("y_last_active"))),
      Cumulate.MergeCol("is_active", col("t_payload").isNotNull),
      Cumulate.MergeCol("ordinals_since_last_active",
        when(col("t_payload").isNotNull, lit(0))
          .otherwise(lit(ordinal) - col("y_last_active")).cast("int"))))
}
