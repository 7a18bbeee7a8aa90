package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time joins and streaming deduplication — the
  * two stateful-operator classes a production clickstream pipeline
  * layers on top of the reference's Flink surface (the reference stops
  * at windowed aggregation; attribution and at-least-once-source
  * dedup are the next operators every deployment adds).
  *
  * Scale contract: every join carries BOTH a key equality and a
  * two-sided event-time bound, and both inputs are watermarked — that
  * is the combination that lets Spark expire join state instead of
  * buffering the streams forever. State per side is bounded by
  * (watermark delay + join interval) × input rate, independent of
  * total stream length.
  */
object StreamJoins {

  /** Click-through attribution: every (view, click) pair for the same
    * user where the click lands in [view_ts, view_ts + maxDelay].
    * Inner join — emits as soon as both sides arrive; state for a view
    * row is dropped once the click-side watermark passes
    * view_ts + maxDelay.
    *
    * Inputs: views(view_user, view_id, view_ts),
    * clicks(click_user, click_id, click_ts) — pre-renamed so the join
    * output needs no disambiguation downstream.
    */
  def clickAttribution(views: DataFrame, clicks: DataFrame,
      maxDelay: String = "10 minutes",
      watermark: String = "30 seconds"): DataFrame =
    views.withWatermark("view_ts", watermark)
      .join(clicks.withWatermark("click_ts", watermark),
        expr(s"""view_user = click_user AND
                 click_ts >= view_ts AND
                 click_ts <= view_ts + interval $maxDelay"""))

  /** Left-outer variant: unmatched views surface with NULL click
    * columns once the watermark proves no click can still arrive —
    * the "impressions that never converted" feed. Same state bound;
    * the null row is emitted at state eviction, not at arrival.
    */
  def clickAttributionOuter(views: DataFrame, clicks: DataFrame,
      maxDelay: String = "10 minutes",
      watermark: String = "30 seconds"): DataFrame =
    views.withWatermark("view_ts", watermark)
      .join(clicks.withWatermark("click_ts", watermark),
        expr(s"""view_user = click_user AND
                 click_ts >= view_ts AND
                 click_ts <= view_ts + interval $maxDelay"""),
        "leftOuter")

  /** At-least-once source dedup: drop redelivered events by id while
    * keeping only (watermark-delay)-bounded state —
    * `dropDuplicatesWithinWatermark` evicts each id's fingerprint once
    * the watermark passes its event time plus the delay, so a Kafka
    * replay storm cannot grow state without bound (an unbounded
    * `dropDuplicates` would pin every id ever seen).
    *
    * Contract: duplicates must arrive within the watermark delay of
    * the first copy — exactly the at-least-once redelivery window of
    * the sources this guards against.
    */
  def dedupByIdWithinWatermark(events: DataFrame, idCol: String,
      tsCol: String, delay: String = "1 minute"): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(idCol)
}
