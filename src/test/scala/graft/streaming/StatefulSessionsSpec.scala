package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(host: String, ip: String, t: String) =
    WebEvent("/p", "r", "ua", host, ip, "{}", s"2024-01-01T$t.000Z")

  test("custom-state sessionizer: gap close, out-of-order merge, timeout flush") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[WebEvent]
    val q = StatefulSessions.sessionize(input.toDF(), gapSeconds = 300L)
      .writeStream.format("memory").queryName("stateful_sessions")
      .outputMode("append").start()
    try {
      // batch 1: out-of-order events within one session + second ip
      input.addData(Seq(
        ev("a.com", "1.1.1.1", "00:02:00"),
        ev("a.com", "1.1.1.1", "00:00:00"),
        ev("a.com", "1.1.1.1", "00:04:00"),
        ev("a.com", "9.9.9.9", "00:00:30")))
      q.processAllAvailable()
      // batch 2: same key far later → closes session 1 inline, and
      // advances the watermark far enough to time out everything open
      input.addData(Seq(ev("a.com", "1.1.1.1", "01:00:00")))
      q.processAllAvailable()
      input.addData(Seq(ev("b.com", "2.2.2.2", "03:00:00")))
      q.processAllAvailable()

      val rows = spark.table("stateful_sessions")
        .select($"ip", $"n_events").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      assert(rows("1.1.1.1") == Seq(1L, 3L),
        s"expected closed sessions of 3 (merged, out-of-order) and 1: $rows")
      assert(rows("9.9.9.9") == Seq(1L))
    } finally q.stop()
  }
}
