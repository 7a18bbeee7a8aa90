package graft.operators

import java.sql.Timestamp
import java.time.LocalDate
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** The growth-accounting state machine vs a sequential per-user
  * reference: on ANY random activity pattern, [[GrowthAccounting
  * .dailyStates]]'s one-shuffle set-probe formulation must label every
  * (user, day) exactly as the day-by-day walk of the reference's
  * decision table does — new on the first day, then
  * retained / resurrected / churned / stale from (active, activeYday).
  */
object GrowthAccountingProps
    extends Properties("GrowthAccounting.dailyStates") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private val day0 = LocalDate.of(2024, 3, 1)

  // 1-4 users, each active on a random subset of a 12-day window
  // (multiple events per day allowed — the set-probe must dedup)
  private val eventsGen: Gen[List[(String, Int)]] =
    Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, for {
        u <- Gen.oneOf("u1", "u2", "u3", "u4")
        d <- Gen.choose(0, 11)
      } yield (u, d)))

  private def brute(events: Seq[(String, Int)])
      : Set[(String, Int, String)] = {
    val horizon = events.map(_._2).max
    events.groupBy(_._1).flatMap { case (u, evs) =>
      val activeDays = evs.map(_._2).toSet
      val first = activeDays.min
      (first to horizon).map { d =>
        val active = activeDays(d)
        val yday = activeDays(d - 1)
        val state =
          if (d == first) "new"
          else if (active && yday) "retained"
          else if (active) "resurrected"
          else if (yday) "churned"
          else "stale"
        (u, d, state)
      }
    }.toSet
  }

  property("set-probe formulation equals the sequential walk") =
    forAll(eventsGen) { events =>
      val df = events.map { case (u, d) =>
        (u, Timestamp.valueOf(day0.plusDays(d).atTime(12, 0)))
      }.toDF("user_id", "ts").repartition(5)
      val got = GrowthAccounting.dailyStates(df, "user_id", "ts")
        .select($"user_id", $"day", $"state")
        .as[(String, java.sql.Date, String)].collect()
        .map { case (u, d, s) =>
          (u, java.time.temporal.ChronoUnit.DAYS
            .between(day0, d.toLocalDate).toInt, s)
        }.toSet
      val expected = brute(events)
      val ok = got == expected
      if (!ok) println(s"growth mismatch: gotOnly=${got -- expected} " +
        s"expOnly=${expected -- got}")
      ok
    }
}
