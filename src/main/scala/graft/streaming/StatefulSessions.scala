package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via `flatMapGroupsWithState` — the
  * arbitrary-state primitive (SURVEY §2.9 design note). The built-in
  * `session_window` covers the homework's gap semantics;
  * this operator is the template for session logic the built-in can't
  * express (per-session caps, custom merge rules, enriched state).
  *
  * State per key = the one open session (bounded); an event-time
  * timeout fires once the watermark passes last_seen + gap and flushes
  * the session. This is exactly Flink's keyed-state + timer pattern,
  * in Spark form.
  */
object StatefulSessions {

  case class SessionKey(ip: String, host: String)
  case class OpenSession(startMs: Long, lastMs: Long, n: Long)
  case class ClosedSession(ip: String, host: String,
      session_start: Timestamp, session_end: Timestamp, n_events: Long)

  /** @param df web events (StreamingJobs.webEventSchema shape)
    * @param gapSeconds session gap
    */
  def sessionize(df: DataFrame, gapSeconds: Long = 300L)
      : Dataset[ClosedSession] = {
    val spark = df.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000L

    StreamingJobs.withEventTime(df)
      .withWatermark("event_timestamp", "15 seconds")
      .filter(col("event_timestamp").isNotNull) // unparseable event_time
      .select(col("ip").as[String], col("host").as[String],
        col("event_timestamp").as[Timestamp])
      .groupByKey { case (ip, host, _) => SessionKey(ip, host) }
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state: GroupState[OpenSession]) =>
          def close(s: OpenSession) = ClosedSession(key.ip, key.host,
            new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n)

          if (state.hasTimedOut) {
            // watermark passed last+gap: flush the open session
            val out = state.getOption.map(close).toSeq
            state.remove()
            out.iterator
          } else {
            val times = rows.map(_._3.getTime).toSeq.sorted
            var closed = List.empty[ClosedSession]
            var open = state.getOption
            times.foreach { t =>
              open match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  // late in-gap event may precede the open session's
                  // start (within the watermark) — extend backward too
                  open = Some(s.copy(startMs = math.min(s.startMs, t),
                    lastMs = math.max(s.lastMs, t), n = s.n + 1))
                case Some(s) =>
                  closed ::= close(s)
                  open = Some(OpenSession(t, t, 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // Spark REJECTS a timeout at or before the current
              // watermark (IllegalArgumentException kills the query) —
              // reachable whenever the session gap is shorter than the
              // watermark delay and an in-watermark straggler arrives.
              // Clamping to watermark+1 preserves semantics: the
              // session was due to flush anyway, and the timer fires
              // on the next batch.
              state.setTimeoutTimestamp(math.max(s.lastMs + gapMs,
                state.getCurrentWatermarkMs() + 1))
            }
            closed.reverseIterator
          }
      }
  }
}
