package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — the gaps-and-islands analog of the Flink
  * session-window homework (`4-apache-flink-training/homework/
  * homework.md:1-7`), usable over historical data: a new session opens
  * when the gap since the key's previous event exceeds `gapSeconds`.
  *
  * Scale: one shuffle (window partitioned by the session key); the
  * lag → flag → running-sum pass reuses that single exchange, then the
  * per-session aggregation groups on (key, session_id) which is a
  * prefix-aligned repartition.
  */
object Sessionize {

  /** @return one row per session:
    *         key cols, session_id, session_start, session_end, n_events
    */
  def byGap(df: DataFrame, keys: Seq[String], tsCol: String,
      gapSeconds: Long): DataFrame = {
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(col(tsCol))
    val flagged = df
      .withColumn("_prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("_new_session",
        when(col("_prev_ts").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("_prev_ts")) >
            gapSeconds * 1000000L, 1).otherwise(0))
      .withColumn("_session_id", sum(col("_new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy(keyCols :+ col("_session_id").as("session_id"): _*)
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }
}
