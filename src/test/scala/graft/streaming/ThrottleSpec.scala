package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Ingest-backpressure fixtures: `maxFilesPerTrigger` bounding a
  * backlog drain into steady-state-sized micro-batches, and the
  * deterministic `rate-micro-batch` source (the reproducible form of
  * the rate source — fixed rows per batch instead of wall-clock
  * rows-per-second, so tests pin exact values).
  */
class ThrottleSpec extends SparkSpec {
  import spark.implicits._

  private def ev(host: String, ip: String, t: String): WebEvent =
    WebEvent(s"https://$host/x", "", "UA", host, ip, "{}",
      s"2024-01-01T$t.000Z")

  test("maxFilesPerTrigger=1 drains a 3-file backlog as 3 bounded " +
    "micro-batches, no loss, no reprocessing") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_throttle").toString
    val (src, ckpt) = (s"$base/src", s"$base/ckpt")
    def land(evs: Seq[WebEvent]): Unit =
      evs.toDF().coalesce(1).write.mode("append").parquet(src)
    // a "backlog": three files of 2/3/4 rows landed before any drain
    land((1 to 2).map(i => ev("a.com", s"1.1.1.$i", "00:00:10")))
    land((1 to 3).map(i => ev("b.com", s"2.2.2.$i", "00:01:00")))
    land((1 to 4).map(i => ev("c.com", s"3.3.3.$i", "00:02:00")))
    val seen = scala.collection.mutable.Buffer.empty[(Long, Long)]
    StreamingJobs.throttledFileDrain(spark, src, ckpt, 1,
      (df, id) => seen.synchronized { seen += id -> df.count() })
    assert(seen.size == 3,
      s"one micro-batch per file under maxFilesPerTrigger=1: $seen")
    assert(seen.map(_._2).sorted == Seq(2L, 3L, 4L),
      s"each batch must carry exactly one file's rows: $seen")
    // a second drain with nothing new is a no-op (checkpoint holds)
    StreamingJobs.throttledFileDrain(spark, src, ckpt, 1,
      (df, id) => seen.synchronized { seen += id -> df.count() })
    assert(seen.map(_._2).sum == 9, s"no reprocessing: $seen")
  }

  test("rate-micro-batch source emits deterministic values and " +
    "batch-stepped timestamps") {
    val got = scala.collection.mutable.Map
      .empty[Long, Seq[(java.sql.Timestamp, Long)]]
    val q = spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", 5)
      .option("startTimestamp", 0L)
      .option("advanceMillisPerBatch", 1000)
      .load()
      .writeStream
      .foreachBatch {
        (df: org.apache.spark.sql.DataFrame, id: Long) =>
          val rows = df.select($"timestamp", $"value")
            .as[(java.sql.Timestamp, Long)].collect().toSeq
          got.synchronized { if (id < 3) got(id) = rows }
      }
      .start()
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (got.synchronized(got.size) < 3 &&
          System.nanoTime() < deadline)
        Thread.sleep(50)
    } finally q.stop()
    val byBatch = got.synchronized(got.toMap)
    assert(byBatch.size == 3, s"expected 3 batches: ${byBatch.keySet}")
    assert(byBatch.values.flatMap(_.map(_._2)).toSeq.sorted ==
      (0L to 14L), "values are a contiguous sequence across batches")
    (0L to 2L).foreach { id =>
      val vs = byBatch(id).map(_._2).sorted
      assert(vs == (id * 5 to id * 5 + 4),
        s"batch $id carries exactly its 5 values: $vs")
      val ts = byBatch(id).map(_._1.getTime).distinct
      assert(ts == Seq(id * 1000),
        s"batch $id rows share the stepped timestamp: $ts")
    }
  }
}
