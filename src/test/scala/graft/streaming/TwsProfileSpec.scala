package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import TwsProfile.Profile

/** Drives [[TwsProfile]] with `Trigger.AvailableNow` restarts against
  * one MemoryStream and a stable checkpoint. Two choices here are
  * load-bearing, not conveniences:
  *
  *  - a `TimeMode.ProcessingTime` transformWithState query reports
  *    shouldRunAnotherBatch=true unconditionally (processing time
  *    must keep advancing for TTL), so a continuous-trigger query
  *    never quiesces (`processAllAvailable()` never returns) and even
  *    AvailableNow only terminates with no-data micro-batches
  *    disabled;
  *  - the memory sink refuses checkpoint recovery, so the restarting
  *    harness collects through `foreachBatch` — which also makes each
  *    drain the exact incremental-drain production pattern, and
  *    proves TWS state survives a restart.
  */
class TwsProfileSpec extends SparkSpec {
  import spark.implicits._

  private def withTwsConfs[A](body: => A): A = {
    val settings = Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        ("org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider"),
      "spark.sql.streaming.noDataMicroBatches.enabled" -> "false")
    val prev = settings.map { case (k, _) => k -> spark.conf.getOption(k) }
    settings.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** One AvailableNow drain per call; returns ALL rows emitted so far. */
  private final class Harness(ttl: java.time.Duration) {
    private val ckpt = java.nio.file.Files
      .createTempDirectory("graft_tws_profile").toString
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input: MemoryStream[(Long, String, Long)] =
      MemoryStream[(Long, String, Long)]
    private val emitted =
      scala.collection.mutable.ArrayBuffer.empty[Profile]

    def drain(batch: Seq[(Long, String, Long)]): Seq[Profile] = {
      input.addData(batch)
      val q = TwsProfile.profiles(
          input.toDF().toDF("user_id", "event_type", "cents"),
          recentK = 3, ttl = ttl)
        .writeStream
        .foreachBatch { (b: Dataset[Profile], _: Long) =>
          val rows = b.collect()
          emitted.synchronized { emitted ++= rows }
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
      emitted.synchronized(emitted.toSeq)
    }
  }

  test("MapState counters and the bounded ListState buffer " +
    "accumulate across restarted drains") {
    withTwsConfs {
      val h = new Harness(java.time.Duration.ofHours(1))
      // drain-1 cents are equal on purpose: the recent-buffer trim
      // drops ONE of them later, and row order within a key's batch
      // iterator is not contractual
      val first = h.drain(Seq((1L, "view", 10L), (1L, "view", 10L),
        (2L, "click", 5L)))
      assert(first.contains(Profile(1L, 1, "view", 2L, 20L)),
        s"drain-1 profile for user 1 must be (1, view, 2, 20): $first")
      assert(first.contains(Profile(2L, 1, "click", 1L, 5L)), s"$first")

      val second = h.drain(Seq((1L, "click", 40L), (1L, "click", 50L)))
      // counts view→2 click→2: the tie breaks to the LEXICOGRAPHICALLY
      // smaller type; recents [10,10,40,50] trim to the last 3 → 100
      assert(second.contains(Profile(1L, 2, "click", 2L, 100L)),
        "user 1 must accumulate across the restart " +
          s"(tie → 'click', trimmed recents sum 100): $second")
    }
  }

  test("processing-time TTL expires an idle profile (both states)") {
    withTwsConfs {
      val h = new Harness(java.time.Duration.ofMillis(500))
      h.drain(Seq((1L, "view", 10L)))
      Thread.sleep(2000) // well past the 500 ms TTL
      val out = h.drain(Seq((1L, "click", 7L)))
      // the view count and the 10-cent recent value are gone: the
      // post-TTL drain sees a fresh profile
      assert(out.contains(Profile(1L, 1, "click", 1L, 7L)),
        s"expired state must not leak into the new profile: $out")
      assert(!out.exists(p => p.user_id == 1L && p.n_types > 1),
        s"the expired 'view' counter must not resurface: $out")
    }
  }
}
