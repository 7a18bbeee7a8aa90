package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class RunningTotalsSpec extends SparkSpec {
  import spark.implicits._

  test("transformWithState keeps per-key totals across micro-batches") {
    implicit val ctx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, Long)]
    val q = RunningTotals.totals(input.toDF()
        .toDF("user_id", "cents"))
      .writeStream.format("memory").queryName("running_totals")
      .outputMode("update").start()
    try {
      input.addData(Seq((1L, 100L), (1L, 50L), (2L, 10L)))
      q.processAllAvailable()
      input.addData(Seq((1L, 25L), (3L, 7L)))
      q.processAllAvailable()
      // update-mode memory sink appends each batch's emissions; the
      // LAST row per key is the current running total
      val rows = spark.table("running_totals")
        .as[(Long, Long, Long)].collect()
      val latest = rows.zipWithIndex
        .groupBy(_._1._1).view
        .mapValues(_.maxBy(_._2)._1).toMap
      assert(latest(1L) == ((1L, 3L, 175L)),
        s"user 1 must accumulate across batches: ${latest(1L)}")
      assert(latest(2L) == ((2L, 1L, 10L)))
      assert(latest(3L) == ((3L, 1L, 7L)))
      // and batch-1 emissions must reflect only batch-1 input
      assert(rows.contains((1L, 2L, 150L)),
        "batch-1 emission for user 1 must be (2, 150)")
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
