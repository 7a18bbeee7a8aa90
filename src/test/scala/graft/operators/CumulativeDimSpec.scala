package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The players-table contract (`pipeline_query.sql`): struct-array
  * history accumulation, activity flags, and incremental ≡ direct.
  */
class CumulativeDimSpec extends SparkSpec {
  import spark.implicits._

  // (player, season, points)
  private lazy val seasons = Seq(
    ("mj", 2001, 25.0), ("mj", 2002, 28.0),
    ("se", 2001, 10.0),                     // retires after 2001
    ("nk", 2002, 15.0))                     // debuts in 2002
    .toDF("player", "season", "pts")

  private def payload = struct($"season", $"pts")

  test("direct build: ordered history + activity bookkeeping") {
    val got = CumulativeDim.direct(seasons, "player", "season", payload)
    val rows = got.select($"player", size($"history"), $"last_active",
      $"is_active", $"ordinals_since_last_active")
      .as[(String, Int, Int, Boolean, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows("mj") == ("mj", 2, 2002, true, 0))
    assert(rows("se") == ("se", 1, 2001, false, 1))
    assert(rows("nk") == ("nk", 1, 2002, true, 0))
    val mjHist = got.filter($"player" === "mj")
      .select($"history").head().getSeq[org.apache.spark.sql.Row](0)
    assert(mjHist.map(_.getInt(0)) == Seq(2001, 2002), "sorted by season")
  }

  test("incremental fold equals direct backfill") {
    val prev = CumulativeDim.direct(
      seasons.filter($"season" <= 2001), "player", "season", payload)
    val today2002 = seasons.filter($"season" === 2002)
      .select($"player", payload.as("payload"))
    val inc = CumulativeDim.increment(prev, today2002, "player",
      "struct<season:int,pts:double>", 2002)
    val full = CumulativeDim.direct(seasons, "player", "season", payload)
    assertDfEquality(
      inc.select($"player", $"history", $"last_active", $"is_active",
        $"ordinals_since_last_active"),
      full.select($"player", $"history", $"last_active", $"is_active",
        $"ordinals_since_last_active"))
  }
}
