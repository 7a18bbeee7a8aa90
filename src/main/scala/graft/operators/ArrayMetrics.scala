package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Monthly array-metric facts (reference
  * `lecture-lab/array_metrics_analysis.sql` + `generate_monthly_array_
  * metrics.sql:18-20`): one row per entity per month carrying a
  * position-per-day metric array, zero-filled for inactive days
  * (`ARRAY_FILL`), aggregated positionally (`SUM(metric_array[i])`).
  */
object ArrayMetrics {

  /** Build per-entity day-indexed metric arrays for one month window.
    *
    * @param df        rows with an entity key and a date + metric value
    * @param entity    entity column name
    * @param dayCol    date column name
    * @param metricCol per-(entity, day) metric (already aggregated)
    * @param anchor    first day of the window
    * @param nDays     array length (days in window)
    * @return (entity, metric_array) with metric_array[i] = metric on
    *         anchor+i, 0 where absent
    */
  def monthlyArray(df: DataFrame, entity: String, dayCol: String,
      metricCol: String, anchor: Column): DataFrame = {
    // horizon = days between anchor and the latest observed day; a
    // 1-row broadcast, never a driver-side collect
    val horizon =
      df.agg((max(datediff(col(dayCol), anchor)) + 1).as("_n_days"))
    df
      .groupBy(col(entity))
      .agg(map_from_entries(
        collect_list(struct(
          datediff(col(dayCol), anchor).as("idx"),
          col(metricCol).as("m")))).as("by_idx"))
      .crossJoin(broadcast(horizon))
      .select(col(entity),
        transform(sequence(lit(0), col("_n_days") - 1),
          i => coalesce(call_function("element_at", col("by_idx"), i),
            lit(0L))).as("metric_array"))
  }

  /** Positional aggregation: total of metric_array[i] across entities
    * (reference `SUM(hit_array[1])`, `quick_sum_device_hits.sql:1-7`).
    * posexplode keeps this fully distributed — no driver arrays.
    */
  def positionalTotals(arrays: DataFrame, arrayCol: String): DataFrame =
    arrays
      // outer + attribute filter: a plain posexplode infers a
      // size(arrayCol) > 0 filter that pushes below the array-building
      // projection and recomputes it (see Dedup.lshBandSummary)
      .select(posexplode_outer(col(arrayCol)).as(Seq("day_idx", "m")))
      .filter(col("day_idx").isNotNull)
      .groupBy(col("day_idx"))
      .agg(sum(col("m")).as("total"))
}
