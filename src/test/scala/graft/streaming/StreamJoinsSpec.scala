package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

case class ViewEv(view_user: Long, view_id: Long, view_ts: Timestamp)
case class ClickEv(click_user: Long, click_id: Long, click_ts: Timestamp)
case class IdEv(event_id: Long, ts: Timestamp, payload: String)

/** Stream-stream join + watermarked-dedup fixtures. Each test drives
  * MemoryStreams batch by batch so watermark movement — the part that
  * bounds state at 100 TB — is what's actually asserted, not just the
  * row algebra.
  */
class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s")

  test("inner click attribution joins within the interval only") {
    implicit val ctx = spark.sqlContext
    val views = MemoryStream[ViewEv]
    val clicks = MemoryStream[ClickEv]
    val q = StreamJoins
      .clickAttribution(views.toDF(), clicks.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("ssj_inner")
      .outputMode("append").start()
    try {
      views.addData(Seq(
        ViewEv(1, 100, t("10:00:00")), ViewEv(2, 101, t("10:00:00"))))
      clicks.addData(Seq(
        ClickEv(1, 900, t("10:05:00")), // in window      → match
        ClickEv(1, 901, t("10:20:00")), // past maxDelay  → no match
        ClickEv(2, 902, t("09:59:00")), // before view    → no match
        ClickEv(3, 903, t("10:01:00")))) // no such view  → no match
      q.processAllAvailable()
      val got = spark.table("ssj_inner")
        .select($"view_id", $"click_id").as[(Long, Long)].collect().toSet
      assert(got == Set((100L, 900L)),
        s"expected exactly the in-window pair, got $got")
    } finally q.stop()
  }

  test("outer attribution emits the unconverted view with NULL click " +
    "only after the watermark proves no click can arrive") {
    implicit val ctx = spark.sqlContext
    val views = MemoryStream[ViewEv]
    val clicks = MemoryStream[ClickEv]
    val q = StreamJoins
      .clickAttributionOuter(views.toDF(), clicks.toDF(),
        "10 minutes", "30 seconds")
      .writeStream.format("memory").queryName("ssj_outer")
      .outputMode("append").start()
    try {
      views.addData(Seq(
        ViewEv(1, 100, t("10:00:00")), ViewEv(2, 101, t("10:00:00"))))
      clicks.addData(Seq(ClickEv(1, 900, t("10:02:00"))))
      q.processAllAvailable()
      // matched pair may emit immediately; the unmatched view must NOT
      // have emitted yet — its join window is still open
      val early = spark.table("ssj_outer")
        .filter($"view_id" === 101).count()
      assert(early == 0, "unmatched view emitted before watermark close")

      // push both watermarks far past view_ts + maxDelay + delay
      views.addData(Seq(ViewEv(9, 999, t("11:00:00"))))
      clicks.addData(Seq(ClickEv(9, 998, t("11:00:00"))))
      q.processAllAvailable()
      // one more nudge: outer-join null emission happens at state
      // eviction, which some versions defer one micro-batch further
      views.addData(Seq(ViewEv(9, 1000, t("11:30:00"))))
      clicks.addData(Seq(ClickEv(9, 1001, t("11:30:00"))))
      q.processAllAvailable()

      val unmatched = spark.table("ssj_outer")
        .filter($"view_id" === 101)
        .select($"click_id").collect()
      assert(unmatched.length == 1 && unmatched.head.isNullAt(0),
        s"expected one NULL-click row for view 101, got " +
          s"${unmatched.mkString(",")}")
      // and the matched pair is present exactly once
      assert(spark.table("ssj_outer")
        .filter($"view_id" === 100 && $"click_id" === 900).count() == 1)
    } finally q.stop()
  }

  test("join state is evicted once the watermark passes the interval") {
    implicit val ctx = spark.sqlContext
    val views = MemoryStream[ViewEv]
    val clicks = MemoryStream[ClickEv]
    val q = StreamJoins
      .clickAttribution(views.toDF(), clicks.toDF(),
        "10 minutes", "30 seconds")
      .writeStream.format("memory").queryName("ssj_state")
      .outputMode("append").start()
    try {
      views.addData((1 to 50).map(i => ViewEv(i, 100 + i, t("10:00:00"))))
      clicks.addData(Seq(ClickEv(1, 900, t("10:00:30"))))
      q.processAllAvailable()
      val loaded = q.lastProgress.stateOperators.head.numRowsTotal
      assert(loaded >= 50, s"expected the 50 views buffered, got $loaded")

      // watermark sweep: 11:00 is past 10:00 + 10 min + 30 s on both
      // sides, so every buffered view row must be evicted
      views.addData(Seq(ViewEv(999, 1999, t("11:00:00"))))
      clicks.addData(Seq(ClickEv(998, 1998, t("11:00:00"))))
      q.processAllAvailable()
      views.addData(Seq(ViewEv(999, 2000, t("11:30:00"))))
      clicks.addData(Seq(ClickEv(998, 2001, t("11:30:00"))))
      q.processAllAvailable()
      val after = q.lastProgress.stateOperators.head.numRowsTotal
      assert(after < 50,
        s"join state not evicted after watermark sweep: $after rows")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: replays deduped, state bounded") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[IdEv]
    val q = StreamJoins
      .dedupByIdWithinWatermark(input.toDF(), "event_id", "ts",
        "1 minute")
      .writeStream.format("memory").queryName("ssj_dedup")
      .outputMode("append").start()
    try {
      // an at-least-once source redelivers ids 1..10 three times
      // within the delay window
      val batch = (1L to 10L).map(i => IdEv(i, t("10:00:00"), s"p$i"))
      input.addData(batch); q.processAllAvailable()
      input.addData(batch); q.processAllAvailable()
      input.addData(batch ++ Seq(IdEv(11, t("10:00:30"), "p11")))
      q.processAllAvailable()
      val ids = spark.table("ssj_dedup").select($"event_id")
        .as[Long].collect().toList
      assert(ids.sorted == (1L to 11L).toList,
        s"dedup failed: ${ids.sorted}")

      // watermark far past ts + delay → fingerprints evicted; a LATE
      // redelivery of id 1 is outside the contract window and would
      // re-emit — assert state actually shrank instead of pinning ids
      val stateLoaded = q.lastProgress.stateOperators.head.numRowsTotal
      input.addData(Seq(IdEv(12, t("11:00:00"), "p12")))
      q.processAllAvailable()
      input.addData(Seq(IdEv(13, t("11:30:00"), "p13")))
      q.processAllAvailable()
      val stateAfter = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateAfter < stateLoaded,
        s"dedup state not evicted: $stateLoaded -> $stateAfter")
    } finally q.stop()
  }
}
