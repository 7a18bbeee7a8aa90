package graft.operators

import java.sql.Timestamp
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("lastPrior picks the latest right row at or before left ts") {
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 11:00:00"), 110.0),
      ("B", ts("2024-01-01 10:30:00"), 50.0))
      .toDF("sym_q", "qts", "price")
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:30:00")),  // between quotes → 100
      (2L, "A", ts("2024-01-01 11:00:00")),  // exact tie → <= matches 110
      (3L, "A", ts("2024-01-01 09:00:00")),  // before any quote → null
      (4L, "B", ts("2024-01-01 12:00:00")),  // B's only quote → 50
      (5L, "C", ts("2024-01-01 12:00:00"))) // no quotes at all → null
      .toDF("trade_id", "sym", "tts")
    val got = AsOfJoin.lastPrior(trades, quotes,
      $"sym", $"sym_q", $"tts", $"qts")
      .select($"trade_id", $"asof.price")
      .as[(Long, Option[Double])].collect().toMap
    assert(got == Map(
      1L -> Some(100.0), 2L -> Some(110.0), 3L -> None,
      4L -> Some(50.0), 5L -> None))
  }
}
