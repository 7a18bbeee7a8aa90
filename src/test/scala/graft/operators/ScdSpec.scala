package graft.operators

import graft.SparkSpec

/** Ports the reference's own SCD unit test
  * (`3-spark-fundamentals/src/tests/test_player_scd.py:8-24`) and adds
  * the incremental≡backfill equivalence the reference never verified.
  */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  test("backfill splits streaks (reference player_scd fixture)") {
    val input = Seq(
      ("Michael Jordan", 2001, "Good"),
      ("Michael Jordan", 2002, "Good"),
      ("Michael Jordan", 2003, "Bad"),
      ("Someone Else", 2003, "Bad"))
      .toDF("player_name", "current_season", "scoring_class")
    val got =
      Scd.backfill(input, "player_name", "current_season", "scoring_class")
    val expected = Seq(
      ("Michael Jordan", "Good", 2001, 2002),
      ("Michael Jordan", "Bad", 2003, 2003),
      ("Someone Else", "Bad", 2003, 2003))
      .toDF("player_name", "scoring_class",
        "start_current_season", "end_current_season")
    assertDfEquality(got, expected)
  }

  test("multi-attribute SCD: track a struct of (class, is_active)") {
    // the reference's players_scd tracks scoring_class AND is_active
    // (players_scd_table.sql:1-9); the kernel handles it as one struct
    // attribute — change in either field opens a new period
    val input = Seq(
      ("mj", 2001, "Good", true), ("mj", 2002, "Good", false),
      ("mj", 2003, "Good", false))
      .toDF("player_name", "current_season", "scoring_class", "is_active")
      .select($"player_name", $"current_season",
        org.apache.spark.sql.functions.struct($"scoring_class", $"is_active")
          .as("tracked"))
    val got = Scd.backfill(input, "player_name", "current_season", "tracked")
    val periods = got
      .select($"tracked.scoring_class", $"tracked.is_active",
        $"start_current_season", $"end_current_season")
      .as[(String, Boolean, Int, Int)].collect().sortBy(_._3)
    assert(periods.toSeq == Seq(
      ("Good", true, 2001, 2001), ("Good", false, 2002, 2003)))
  }

  test("incremental merge equals full backfill") {
    val hist = Seq(
      ("A", 2001, "Good"), ("A", 2002, "Good"), ("A", 2003, "Good"),
      ("B", 2002, "Bad"), ("B", 2003, "Bad"),
      ("D", 2001, "Good"), ("D", 2002, "Bad"), ("D", 2003, "Bad"))
      .toDF("player_name", "current_season", "scoring_class")
    // 2004: A unchanged, B retires, D changes class, C brand-new
    val today = Seq(("A", "Good"), ("D", "Good"), ("C", "Bad"))
      .toDF("player_name", "scoring_class")
    val scd =
      Scd.backfill(hist, "player_name", "current_season", "scoring_class")
    val inc = Scd.incremental(
      scd, today, "player_name", "current_season", "scoring_class", 2004)
    val full = Scd.backfill(
      hist.unionByName(today.selectExpr(
        "player_name", "2004 AS current_season", "scoring_class")),
      "player_name", "current_season", "scoring_class")
    assertDfEquality(
      inc.select("player_name", "scoring_class",
        "start_current_season", "end_current_season"),
      full.select("player_name", "scoring_class",
        "start_current_season", "end_current_season"))
  }

  test("a NULL-attribute run is ONE period (IS DISTINCT FROM), " +
    "in both backfill and incremental") {
    val hist = Seq(("E", 2000, null: String), ("E", 2001, null: String),
      ("E", 2002, "Good"), ("E", 2003, null: String))
      .toDF("player_name", "current_season", "scoring_class")
    val got = Scd
      .backfill(hist, "player_name", "current_season", "scoring_class")
      .select("scoring_class", "start_current_season",
        "end_current_season")
      .as[(Option[String], Int, Int)].collect().toSet
    assert(got == Set((None, 2000, 2001), (Some("Good"), 2002, 2002),
      (None, 2003, 2003)),
      s"NULL run must not fragment into per-ordinal periods: $got")
    // incremental: a NULL attr staying NULL extends the open period
    val scd = Scd.backfill(hist, "player_name", "current_season",
      "scoring_class")
    val today = Seq(("E", null: String))
      .toDF("player_name", "scoring_class")
    val inc = Scd.incremental(scd, today, "player_name",
        "current_season", "scoring_class", 2004)
      .filter($"end_current_season" === 2004)
      .select("scoring_class", "start_current_season")
      .as[(Option[String], Int)].collect().toSeq
    assert(inc == Seq((None, 2003)),
      s"NULL vs NULL is NOT a change — extend, don't close+reopen: $inc")
  }
}
