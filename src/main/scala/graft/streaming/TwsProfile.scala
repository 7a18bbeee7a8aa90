package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Per-user activity profile via `transformWithState` — completes the
  * Spark-4 arbitrary-state surface: [[RunningTotals]] covers
  * ValueState, [[TwsSessions]] covers timers; this processor exercises
  * the two composite state kinds plus state TTL:
  *
  *  - `MapState[event_type → count]`: per-key sub-keyed counters
  *    (feature-store style) — point lookups and single-entry updates,
  *    NOT a read-modify-write of one blob, so a key with thousands of
  *    types touches only the entries its batch mentions (RocksDB
  *    column-family layout makes each entry its own KV pair).
  *  - `ListState[cents]`: a bounded recent-values buffer (last K),
  *    append-per-row then a trim rewrite only when over capacity —
  *    the "recent items" serving pattern. The trim bounds state size
  *    BY CONSTRUCTION on unbounded streams.
  *  - `TTLConfig(duration)`: processing-time expiry on both states —
  *    an idle user's profile vanishes without a timer per key.
  *    TTL requires `TimeMode.ProcessingTime`; expired entries are
  *    filtered at read and compacted out of RocksDB later.
  *
  * Emission (update mode): one profile row per key per micro-batch —
  * distinct type count, the top type with a DETERMINISTIC tie-break
  * (higher count, then lexicographically smaller type), and the sum
  * of the retained recent buffer. Downstream upsert sinks apply rows
  * idempotently by key, the same contract as RunningTotals.
  *
  * Streaming twin of the batch profile q83 computes; requires the
  * RocksDB state-store provider, as all transformWithState operators
  * do.
  *
  * Operational caveat that callers MUST know: in
  * `TimeMode.ProcessingTime` a transformWithState query always
  * reports it needs another micro-batch (processing time has to keep
  * advancing for TTL expiry), so with a continuous trigger the query
  * re-triggers forever and `processAllAvailable()` NEVER returns —
  * and even `Trigger.AvailableNow` cannot terminate while no-data
  * micro-batches are enabled. Drive it with a real trigger interval
  * in production; for drain-style runs use AvailableNow WITH
  * `spark.sql.streaming.noDataMicroBatches.enabled=false` (TTL is
  * enforced at state read time, so expiry needs no empty batches —
  * see TwsProfileSpec).
  */
object TwsProfile {

  final case class Profile(user_id: Long, n_types: Int, top_type: String,
      top_n: Long, recent_sum: Long)

  private class Processor(recentK: Int, ttl: TTLConfig)
      extends StatefulProcessor[Long, (Long, String, Long), Profile] {
    @transient private var counts: MapState[String, Long] = _
    @transient private var recent: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode)
        : Unit = {
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, ttl)
      recent = getHandle.getListState[Long]("recent",
        Encoders.scalaLong, ttl)
    }

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, String, Long)], timerValues: TimerValues)
        : Iterator[Profile] = {
      rows.foreach { case (_, ty, cents) =>
        val cur = if (counts.containsKey(ty)) counts.getValue(ty) else 0L
        counts.updateValue(ty, cur + 1L)
        recent.appendValue(cents)
      }
      // trim to the last K appended values; the rewrite happens only
      // when over capacity, so steady-state batches are append-only
      val buf = recent.get().toArray
      val kept =
        if (buf.length > recentK) {
          val k = buf.takeRight(recentK)
          recent.put(k)
          k
        } else buf
      val entries = counts.iterator().toArray
      // deterministic top: max count, ties to the smaller type name
      val (topTy, topN) = entries
        .reduceOption { (a, b) =>
          if (a._2 > b._2 || (a._2 == b._2 && a._1 <= b._1)) a else b
        }
        .getOrElse(("", 0L))
      Iterator.single(
        Profile(key, entries.length, topTy, topN, kept.sum))
    }
  }

  /** @param df streaming frame with `user_id` (long), `event_type`
    *           (string), `cents` (long)
    * @param recentK recent-buffer capacity
    * @param ttl     processing-time state expiry (both states);
    *                TTLConfig.NONE is NOT valid here — pass a real
    *                duration, TTL is the point of this operator
    */
  def profiles(df: DataFrame, recentK: Int, ttl: java.time.Duration)
      : Dataset[Profile] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("user_id").as[Long], col("event_type").as[String],
        col("cents").as[Long])
      .groupByKey(_._1)
      .transformWithState(new Processor(recentK, TTLConfig(ttl)),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }
}
