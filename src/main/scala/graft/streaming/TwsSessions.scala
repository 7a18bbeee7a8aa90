package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Gap sessionization on the `transformWithState` API — the modern
  * twin of [[StatefulSessions]] (flatMapGroupsWithState): the open
  * session lives in a typed `ValueState`, and the idle flush is an
  * EVENT-TIME TIMER (`registerTimer` at last_seen + gap; the runtime
  * calls `handleExpiredTimer` once the watermark passes it — Flink's
  * keyed-state + timer pattern, first-class in Spark ≥4.0).
  *
  * Differences from the old API worth the second implementation:
  * timers are explicit and per-key multiple (the old API has ONE
  * implicit timeout per key), state handles are named and typed (a
  * processor can hold several), and initial state / TTL compose. The
  * session semantics themselves are identical — both specs assert the
  * same gap-close/merge/flush behavior.
  */
object TwsSessions {

  case class Open(startMs: Long, lastMs: Long, n: Long)
  case class Closed(ip: String, host: String, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  private class Processor(gapMs: Long)
      extends StatefulProcessor[(String, String),
        (String, String, Timestamp), Closed] {
    @transient private var open: ValueState[Open] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode)
        : Unit =
      open = getHandle.getValueState[Open]("open",
        Encoders.product[Open], TTLConfig.NONE)

    private def close(key: (String, String), s: Open): Closed =
      Closed(key._1, key._2, new Timestamp(s.startMs),
        new Timestamp(s.lastMs), s.n)

    override def handleInputRows(key: (String, String),
        rows: Iterator[(String, String, Timestamp)],
        timerValues: TimerValues): Iterator[Closed] = {
      val times = rows.map(_._3.getTime).toSeq.sorted
      var closed = List.empty[Closed]
      var cur = if (open.exists()) Some(open.get()) else None
      val hadTimer = cur.map(_.lastMs + gapMs)
      times.foreach { t =>
        cur match {
          case Some(s) if t - s.lastMs <= gapMs =>
            // in-gap (possibly late) event extends the session both ways
            cur = Some(s.copy(startMs = math.min(s.startMs, t),
              lastMs = math.max(s.lastMs, t), n = s.n + 1))
          case Some(s) =>
            closed ::= close(key, s)
            cur = Some(Open(t, t, 1))
          case None =>
            cur = Some(Open(t, t, 1))
        }
      }
      cur.foreach { s =>
        open.update(s)
        // move the idle-flush timer to the new horizon (delete the
        // stale one — timers are explicit in this API). Clamped past
        // the current watermark: a gap shorter than the watermark
        // delay can put last+gap at/behind it (the StatefulSessions
        // trap) — the session is due anyway, fire next batch.
        val newTimer = math.max(s.lastMs + gapMs,
          timerValues.getCurrentWatermarkInMs() + 1)
        if (!hadTimer.contains(newTimer)) {
          hadTimer.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(newTimer)
        }
      }
      closed.reverseIterator
    }

    override def handleExpiredTimer(key: (String, String),
        timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo)
        : Iterator[Closed] = {
      // flush ONLY when the watermark genuinely passed last_seen+gap:
      // timer deletes are best-effort (a clamped registration can't be
      // reconstructed from state), so a stale timer may fire early —
      // the guard makes that a no-op re-arm instead of a premature
      // session close
      if (!open.exists()) return Iterator.empty
      val s = open.get()
      val due = s.lastMs + gapMs
      if (timerValues.getCurrentWatermarkInMs() >= due) {
        open.clear()
        Iterator.single(close(key, s))
      } else {
        getHandle.registerTimer(
          math.max(due, timerValues.getCurrentWatermarkInMs() + 1))
        Iterator.empty
      }
    }
  }

  /** @param df web events (StreamingJobs.webEventSchema shape)
    * @param gapSeconds session gap
    */
  def sessionize(df: DataFrame, gapSeconds: Long = 300L)
      : Dataset[Closed] = {
    val spark = df.sparkSession
    import spark.implicits._
    StreamingJobs.withEventTime(df)
      .withWatermark("event_timestamp", "15 seconds")
      .filter(col("event_timestamp").isNotNull)
      .select(col("ip").as[String], col("host").as[String],
        col("event_timestamp").as[Timestamp])
      .groupByKey { case (ip, host, _) => (ip, host) }
      .transformWithState(new Processor(gapSeconds * 1000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
