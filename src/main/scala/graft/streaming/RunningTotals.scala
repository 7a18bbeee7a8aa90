package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-key running totals via `transformWithState` — the
  * arbitrary-state API that supersedes `flatMapGroupsWithState`
  * (Spark ≥4.0): typed state handles acquired in `init`, per-batch
  * input iterators, optional timers/TTL, and a state-store schema
  * that supports multiple named states per key.
  *
  * The job: a continuously-maintained `(n_events, total_cents)` per
  * user — the streaming form of a running GROUP BY, kept in ONE
  * ValueState per key (fixed-width state: the bounded-state
  * discipline that survives unbounded streams; contrast a
  * collect-everything list state). Each micro-batch emits the key's
  * updated totals (update semantics — downstream upsert sinks apply
  * them idempotently by key, same contract as
  * `StreamingJobs.IdempotentBatchSink`).
  *
  * Requires the RocksDB state-store provider
  * (`spark.sql.streaming.stateStore.providerClass` →
  * `…RocksDBStateStoreProvider`) — transformWithState needs its
  * multi-column-family layout; set per query in the caller/spec.
  */
object RunningTotals {

  final case class Totals(n: Long, cents: Long)
  final case class UserTotals(user_id: Long, n_events: Long,
      total_cents: Long)

  private class Processor
      extends StatefulProcessor[Long, (Long, Long), UserTotals] {
    @transient private var state: ValueState[Totals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode)
        : Unit =
      state = getHandle.getValueState[Totals]("totals",
        Encoders.product[Totals], TTLConfig.NONE)

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long)], timerValues: TimerValues)
        : Iterator[UserTotals] = {
      val prev = if (state.exists()) state.get() else Totals(0L, 0L)
      var n = prev.n
      var cents = prev.cents
      rows.foreach { case (_, c) => n += 1; cents += c }
      state.update(Totals(n, cents))
      Iterator.single(UserTotals(key, n, cents))
    }
  }

  /** @param df streaming frame with `user_id` (long) and `cents`
    *           (long) columns
    */
  def totals(df: DataFrame): Dataset[UserTotals] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("user_id").as[Long], col("cents").as[Long])
      .groupByKey(_._1)
      .transformWithState(new Processor, TimeMode.None(),
        OutputMode.Update())
  }
}
