package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Same fixture as StatefulSessionsSpec — the two sessionizers (old
  * flatMapGroupsWithState, new transformWithState + timers) must
  * agree on gap-close, out-of-order merge, and idle timer flush.
  */
class TwsSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(host: String, ip: String, t: String) =
    WebEvent("/p", "r", "ua", host, ip, "{}", s"2024-01-01T$t.000Z")

  test("timer sessionizer: gap close, out-of-order merge, timer flush") {
    implicit val ctx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val input = MemoryStream[WebEvent]
    val q = TwsSessions.sessionize(input.toDF(), gapSeconds = 300L)
      .writeStream.format("memory").queryName("tws_sessions")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        ev("a.com", "1.1.1.1", "00:02:00"),
        ev("a.com", "1.1.1.1", "00:00:00"),
        ev("a.com", "1.1.1.1", "00:04:00"),
        ev("a.com", "9.9.9.9", "00:00:30")))
      q.processAllAvailable()
      // same key far later: closes session 1 inline AND advances the
      // watermark so the idle timers of every open session fire
      input.addData(Seq(ev("a.com", "1.1.1.1", "01:00:00")))
      q.processAllAvailable()
      input.addData(Seq(ev("b.com", "2.2.2.2", "03:00:00")))
      q.processAllAvailable()

      val rows = spark.table("tws_sessions")
        .select($"ip", $"n_events").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      assert(rows("1.1.1.1") == Seq(1L, 3L),
        s"expected closed sessions of 3 (merged) and 1 (timer): $rows")
      assert(rows("9.9.9.9") == Seq(1L))
    } finally {
      q.stop()
      prevProvider match {
        case Some(v) => spark.conf
          .set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf
          .unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
