package graft.operators

import java.sql.Timestamp
import graft.SparkSpec

/** Fixture hits every branch of the state machine
  * (`growth_accounting.sql:19-34`): new, retained, resurrected,
  * churned, stale.
  */
class GrowthAccountingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")

  test("daily states cover all five branches") {
    val events = Seq(
      ("u1", ts(1)), ("u1", ts(2)),           // new → retained
      ("u2", ts(1)), ("u2", ts(3)),           // new → churned → resurrected
      ("u3", ts(1)),                          // new → churned → stale …
      ("u4", ts(4)))                          // horizon extends to day 4
      .toDF("user_id", "ts")
    val got = GrowthAccounting.dailyStates(events, "user_id", "ts")
    val expected = Seq(
      ("u1", "2024-01-01", "new"), ("u1", "2024-01-02", "retained"),
      ("u1", "2024-01-03", "churned"), ("u1", "2024-01-04", "stale"),
      ("u2", "2024-01-01", "new"), ("u2", "2024-01-02", "churned"),
      ("u2", "2024-01-03", "resurrected"), ("u2", "2024-01-04", "churned"),
      ("u3", "2024-01-01", "new"), ("u3", "2024-01-02", "churned"),
      ("u3", "2024-01-03", "stale"), ("u3", "2024-01-04", "stale"),
      ("u4", "2024-01-04", "new"))
      .map { case (u, d, s) => (u, java.sql.Date.valueOf(d), s) }
      .toDF("user_id", "day", "state")
    assertDfEquality(got, expected)
  }

  test("weekly states stay 'retained' across short gaps") {
    // active day 1 and day 5 (gap 3 days): daily says churned between,
    // weekly stays retained because the 7-day window still covers day 1
    val events = Seq(("u1", ts(1)), ("u1", ts(5)), ("u1", ts(15)))
      .toDF("user_id", "ts")
    val got = GrowthAccounting.weeklyStates(events, "user_id", "ts")
      .orderBy("day")
      .collect().map(r => (r.getDate(1).toString, r.getString(2)))
    val byDay = got.toMap
    assert(byDay("2024-01-01") == "new")
    (2 to 11).foreach(i => assert(
      byDay(f"2024-01-$i%02d") == "retained", s"day $i: ${byDay.toSeq.sorted}"))
    assert(byDay("2024-01-12") == "churned")   // window [6..12] empty
    assert(byDay("2024-01-13") == "stale")
    assert(byDay("2024-01-15") == "resurrected")
  }
}
