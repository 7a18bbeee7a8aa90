package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** State-store METRIC assertions for the stateful streaming operators
  * StreamingJobsSpec proves by row algebra: the 100 TB property is not
  * just "the rows are right" but "state actually shrinks when the
  * watermark passes" — an eviction regression keeps every row
  * correct while the state store grows without bound, and only
  * `stateOperators.numRowsTotal` sees it.
  */
class StreamingStateMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(host: String, ip: String, t: String) =
    WebEvent("/page", "ref", "ua", host, ip, "{}",
      s"2024-01-01T$t.000Z")

  test("interval-join state is evicted once the watermark passes " +
    "imp_ts + window") {
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[WebEvent]
    val clicks = MemoryStream[WebEvent]
    val q = StreamingJobs.impressionClickJoin(imps.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("ssm_join")
      .outputMode("append").start()
    try {
      imps.addData((1 to 50).map(i => ev("a.com", s"ip$i", "00:00:00")))
      clicks.addData(Seq(ev("a.com", "ip1", "00:00:30")))
      q.processAllAvailable()
      val loaded = q.lastProgress.stateOperators.head.numRowsTotal
      assert(loaded >= 50,
        s"expected the 50 impressions buffered in join state, got $loaded")

      // both watermarks past imp_ts + 10-min window + 15 s delay;
      // second nudge because eviction runs a micro-batch behind
      Seq("01:00:00", "02:00:00").foreach { t =>
        imps.addData(Seq(ev("a.com", "wm", t)))
        clicks.addData(Seq(ev("a.com", "wm2", t)))
        q.processAllAvailable()
      }
      val after = q.lastProgress.stateOperators.head.numRowsTotal
      assert(after < 50,
        s"join state not evicted after watermark sweep: $after rows")
    } finally q.stop()
  }

  test("dedup fingerprint state is evicted past the horizon — " +
    "a replay storm cannot pin state forever") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[WebEvent]
    val q = StreamingJobs.dedupStream(input.toDF(), Seq("ip"),
        horizon = "1 minute")
      .writeStream.format("memory").queryName("ssm_dedup")
      .outputMode("append").start()
    try {
      val batch = (1 to 40).map(i => ev("a.com", s"ip$i", "00:00:00"))
      input.addData(batch); q.processAllAvailable()
      input.addData(batch); q.processAllAvailable() // the replay storm
      assert(spark.table("ssm_dedup").count() == 40,
        "replayed rows must dedup")
      val loaded = q.lastProgress.stateOperators.head.numRowsTotal
      assert(loaded >= 40, s"expected 40 fingerprints held, got $loaded")

      Seq("01:00:00", "02:00:00").foreach { t =>
        input.addData(Seq(ev("a.com", "wm", t)))
        q.processAllAvailable()
      }
      val after = q.lastProgress.stateOperators.head.numRowsTotal
      assert(after < 40,
        s"dedup state not evicted past the horizon: $after rows")
    } finally q.stop()
  }
}
