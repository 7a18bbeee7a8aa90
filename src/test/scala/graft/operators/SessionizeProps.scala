package graft.operators

import java.sql.Timestamp
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** Gaps-and-islands sessionization vs an in-memory brute force: on ANY
  * event stream (duplicate timestamps, empty gaps, multi-user
  * interleaving), [[Sessionize.byGap]]'s window formulation must emit
  * exactly the sessions a sequential per-user scan produces. Duplicate
  * timestamps matter: gap 0 with equal timestamps must NOT split a
  * session (the gap test is strict >).
  */
object SessionizeProps extends Properties("Sessionize.byGap") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private val base = 1700000000L // seconds

  private val eventsGen: Gen[List[(String, Long)]] =
    Gen.choose(1, 60).flatMap(n =>
      Gen.listOfN(n, for {
        u <- Gen.oneOf("u1", "u2", "u3")
        off <- Gen.choose(0L, 600L) // seconds within a 10-min span
      } yield (u, base + off)))

  private val gapGen: Gen[Long] = Gen.oneOf(1L, 30L, 120L, 601L)

  private def brute(events: Seq[(String, Long)], gap: Long)
      : Set[(String, Long, Long, Long)] =
    events.groupBy(_._1).flatMap { case (u, evs) =>
      val ts = evs.map(_._2).sorted
      val sessions = ts.tail.foldLeft(List(List(ts.head))) {
        case (cur :: done, t) =>
          if (t - cur.head > gap) List(t) :: cur :: done
          else (t :: cur) :: done
        case (Nil, _) => sys.error("unreachable")
      }
      sessions.map(s => (u, s.min, s.max, s.size.toLong))
    }.toSet

  property("window formulation equals the sequential per-user scan") =
    forAll(eventsGen, gapGen) { (events, gap) =>
      val df = events
        .map { case (u, s) => (u, new Timestamp(s * 1000L)) }
        .toDF("user", "ts")
        .repartition(7)
      val got = Sessionize.byGap(df, Seq("user"), "ts", gap)
        .select($"user", $"session_start", $"session_end", $"n_events")
        .as[(String, Timestamp, Timestamp, Long)].collect()
        .map { case (u, s, e, n) =>
          (u, s.getTime / 1000L, e.getTime / 1000L, n)
        }.toSet
      val expected = brute(events, gap)
      val ok = got == expected
      if (!ok) println(s"sessionize mismatch gap=$gap: " +
        s"gotOnly=${got -- expected} expOnly=${expected -- got}")
      ok
    }
}
