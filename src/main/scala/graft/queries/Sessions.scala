package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Sessionize

/** Batch sessionization queries — the historical-data analog of the
  * Flink session-window homework (SURVEY F8), over `events` with a
  * 30-minute gap.
  */
object Sessions {

  val q50_sessionize: Q = Q(
    "q50_sessionize",
    """WITH o AS (SELECT user_id, ts,
      |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      |  FROM events),
      |f AS (SELECT user_id, ts, CASE WHEN prev_ts IS NULL
      |    OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS ns
      |  FROM o),
      |s AS (SELECT user_id, ts, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM f)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  CAST(epoch_us(MIN(ts)) // 1000000 AS BIGINT) AS session_start_s,
      |  COUNT(*) AS n_events
      |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Sessionize.byGap(Tables.load(spark, dir, "events"),
        Seq("user_id"), "ts", gapSeconds = 1800L)
      .select($"user_id", $"session_id".cast("long").as("session_id"),
        (unix_micros($"session_start") / lit(1000000L)).cast("long")
          .as("session_start_s"),
        $"n_events")
      .orderBy($"user_id", $"session_id")
  }

  /** Average events per session per event_type — the homework's
    * avg-per-host comparison, batch form.
    */
  val q51_session_stats: Q = Q(
    "q51_session_stats",
    """WITH o AS (SELECT event_type, user_id, ts,
      |    LAG(ts) OVER (PARTITION BY event_type, user_id ORDER BY ts) AS prev_ts
      |  FROM events),
      |f AS (SELECT event_type, user_id, ts, CASE WHEN prev_ts IS NULL
      |    OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS ns
      |  FROM o),
      |s AS (SELECT event_type, user_id, ts,
      |    SUM(ns) OVER (PARTITION BY event_type, user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM f),
      |sess AS (SELECT event_type, user_id, session_id, COUNT(*) AS n
      |  FROM s GROUP BY 1, 2, 3)
      |SELECT event_type, COUNT(*) AS n_sessions,
      |  CAST(SUM(n) AS DOUBLE) / COUNT(*) AS avg_events_per_session
      |FROM sess GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Sessionize.byGap(Tables.load(spark, dir, "events"),
        Seq("event_type", "user_id"), "ts", gapSeconds = 1800L)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_sessions"),
        (sum($"n_events").cast("double") / count(lit(1)))
          .as("avg_events_per_session"))
      .orderBy($"event_type")
  }

  val all: Seq[Q] = Seq(q50_sessionize, q51_session_stats)
}