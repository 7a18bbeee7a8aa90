package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Exact._

/** Window-function surface (SURVEY §2.5): LAG change detection,
  * ROW_NUMBER dedup, running/rolling/offset frames, partition totals,
  * ordered collect.
  *
  * Scale notes: every window below partitions by a high-cardinality key
  * (user_id, o_custkey) so state per partition stays tiny; the two
  * calendar-day windows first aggregate to one row per day (30–2500
  * rows at any SF) before windowing, so the unpartitioned frame is
  * never applied to raw fact rows.
  */
object Windows {

  /** ROW_NUMBER dedup keeping the latest row per key (reference W2 +
    * P11: `team_vertices.sql:2`, `assignmnet_2.sql:50-62`; ordering made
    * total with the event_id tie-break — the reference's own Spark port
    * fixed this nondeterminism, `team_vertex_job.py:6`). The oracle
    * orders by µs-truncated ts: events.ts is ns in the files, and a
    * raw `ts DESC` would let DuckDB break same-µs ties by the ns tail
    * Spark never sees, picking a different "latest" row.
    */
  val q20_dedup_latest: Q = Q(
    "q20_dedup_latest",
    """SELECT user_id, event_type, event_id, value FROM (
      |  SELECT user_id, event_type, event_id, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY epoch_ns(ts) // 1000 DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts".desc, $"event_id".desc)
    Tables.load(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type", $"event_id", $"value")
      .orderBy($"user_id", $"event_type")
  }

  /** LAG(1) change detection over per-user daily activity (reference
    * W1: `scd_generation_query.sql:5-8`).
    */
  val q21_lag_daily: Q = Q(
    "q21_lag_daily",
    """WITH d AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
      |  FROM events GROUP BY 1, 2)
      |SELECT user_id, day, n_events,
      |  LAG(n_events, 1) OVER (PARTITION BY user_id ORDER BY day) AS prev_n,
      |  MAX(n_events) OVER (PARTITION BY user_id) AS max_n
      |FROM d
      |ORDER BY user_id, day""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val daily = Tables.load(spark, dir, "events")
      .groupBy($"user_id", $"ts".cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy($"user_id").orderBy($"day")
    daily
      .withColumn("prev_n", lag($"n_events", 1).over(w))
      .withColumn("max_n",
        max($"n_events").over(Window.partitionBy($"user_id")))
      .orderBy($"user_id", $"day")
  }

  /** Running cumulative sum per customer (reference W3:
    * `scd_generation_query.sql:17-18` streak id pattern), exact decimal
    * so the running values reproduce bit-for-bit.
    */
  val q22_running_sum: Q = Q(
    "q22_running_sum",
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_total
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, dir, "orders")
      .select($"o_custkey", $"o_orderkey",
        $"o_orderdate".cast("date").as("order_date"),
        sum(money($"o_totalprice")).over(w).cast("double").as("running_total"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** Rolling / offset / whole-partition frames over the daily revenue
    * series (reference W4/W5/W6: `window_based_analysis.sql:30-53` —
    * weekly `-6..0`, prior week `-13..-6`, partition total).
    */
  val q23_frames: Q = Q(
    "q23_frames",
    """WITH d AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1)
      |SELECT day, CAST(rev AS DOUBLE) AS day_rev,
      |  CAST(SUM(rev) OVER (ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_week,
      |  CAST(SUM(rev) OVER (ORDER BY day
      |    ROWS BETWEEN 13 PRECEDING AND 6 PRECEDING) AS DOUBLE) AS rev_prior_week,
      |  CAST(SUM(rev) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE)
      |    AS rev_total
      |FROM d
      |ORDER BY day""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val daily = Tables.load(spark, dir, "orders")
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(money($"o_totalprice")).as("rev"))
    val w = Window.orderBy($"day")
    daily.select(
        $"day",
        $"rev".cast("double").as("day_rev"),
        sum($"rev").over(w.rowsBetween(-6, 0)).cast("double").as("rev_week"),
        sum($"rev").over(w.rowsBetween(-13, -6)).cast("double")
          .as("rev_prior_week"),
        sum($"rev").over(w.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing))
          .cast("double").as("rev_total"))
      .orderBy($"day")
  }

  /** Ordered collect per key (reference A3/W8 windowed ARRAY_AGG,
    * `load_players_table_day2.sql:20-32`): each user's event trail as a
    * comma-joined id list, ordered by time. Emitted as STRING so the
    * oracle compare is representation-stable across engines; the agg
    * order is µs-truncated ts + event_id (the ns-parquet discipline —
    * raw ns ts would order same-µs neighbors differently in DuckDB).
    */
  val q24_ordered_collect: Q = Q(
    "q24_ordered_collect",
    """SELECT user_id,
      |  COUNT(*) AS n_events,
      |  STRING_AGG(CAST(event_id AS VARCHAR), ','
      |    ORDER BY epoch_ns(ts) // 1000, event_id)
      |    AS event_trail
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .groupBy($"user_id")
      .agg(
        count(lit(1)).as("n_events"),
        array_join(
          transform(
            array_sort(collect_list(struct($"ts", $"event_id"))),
            x => x.getField("event_id").cast("string")),
          ",").as("event_trail"))
      .orderBy($"user_id")
  }

  /** Top-k per group via the bounded [[graft.functions.TopK]]
    * aggregator (k-bounded buffer through partial aggregation — ships
    * k rows per partition instead of sorting whole groups like the
    * window formulation; TopKSpec proves result equality with
    * row_number).
    */
  val q25_topk_per_group: Q = Q(
    "q25_topk_per_group",
    """SELECT o_orderstatus, CAST(rn AS INT) AS rank, o_orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price
      |FROM (SELECT o_orderstatus, o_orderkey, o_totalprice,
      |        ROW_NUMBER() OVER (PARTITION BY o_orderstatus
      |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |      FROM orders) t
      |WHERE rn <= 5
      |ORDER BY o_orderstatus, rank""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .groupBy($"o_orderstatus")
      .agg(graft.functions.TopK.topK(5)($"o_totalprice", $"o_orderkey")
        .as("top"))
      .select($"o_orderstatus", posexplode($"top").as(Seq("pos", "t")))
      .select($"o_orderstatus", ($"pos" + 1).cast("int").as("rank"),
        $"t._2".as("o_orderkey"),
        money($"t._1").cast("double").as("total_price"))
      .orderBy($"o_orderstatus", $"rank")
  }

  /** Longest consecutive-day activity streak per user (reference W9
    * homework family: streaks via the LAG + running-sum island id,
    * `4-applying-analytical-patterns/homework/homework.md:26-28`).
    * Uses the date-minus-dense-rank trick: consecutive days share one
    * island key.
    */
  val q26_longest_streak: Q = Q(
    "q26_longest_streak",
    """WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |i AS (SELECT user_id, day,
      |    day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS INT)
      |      AS island
      |  FROM a),
      |s AS (SELECT user_id, island, COUNT(*) AS streak_len,
      |    MIN(day) AS streak_start
      |  FROM i GROUP BY 1, 2)
      |SELECT user_id, CAST(MAX(streak_len) AS INT) AS longest_streak,
      |  MIN(CASE WHEN streak_len = ms THEN streak_start END) AS streak_start
      |FROM (SELECT *, MAX(streak_len) OVER (PARTITION BY user_id) AS ms FROM s) t
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"day")
    val islands = Tables.load(spark, dir, "events")
      .select($"user_id", $"ts".cast("date").as("day"))
      .distinct()
      .withColumn("island",
        date_sub($"day", row_number().over(byUser)))
    val streaks = islands
      .groupBy($"user_id", $"island")
      .agg(count(lit(1)).as("streak_len"), min($"day").as("streak_start"))
      .withColumn("ms",
        max($"streak_len").over(Window.partitionBy($"user_id")))
    streaks
      .groupBy($"user_id")
      .agg(
        max($"streak_len").cast("int").as("longest_streak"),
        min(when($"streak_len" === $"ms", $"streak_start"))
          .as("streak_start"))
      .orderBy($"user_id")
  }

  /** The full window-based dashboard (reference
    * `window_based_analysis.sql:8-53` composite): LIKE-classified
    * traffic classes × day, with per-class running cumulative, rolling
    * week, and share-of-class-total — every frame in one pass over one
    * shuffle (all windows partition by the same key).
    */
  val q27_window_dashboard: Q = Q(
    "q27_window_dashboard",
    """WITH c AS (SELECT CASE WHEN event_type LIKE '%view%'
      |         OR event_type LIKE '%click%' THEN 'browse'
      |       WHEN event_type = 'purchase' THEN 'commerce'
      |       ELSE 'other' END AS event_class,
      |    CAST(ts AS DATE) AS day
      |  FROM events),
      |d AS (SELECT event_class, day, COUNT(*) AS n FROM c GROUP BY 1, 2)
      |SELECT event_class, day, n,
      |  CAST(SUM(n) OVER (PARTITION BY event_class ORDER BY day
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative,
      |  CAST(SUM(n) OVER (PARTITION BY event_class ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_week,
      |  CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY event_class
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |    AS share_of_class
      |FROM d
      |ORDER BY event_class, day""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val classified = Tables.load(spark, dir, "events")
      .withColumn("event_class",
        when($"event_type".like("%view%") ||
          $"event_type".like("%click%"), "browse")
          .when($"event_type" === "purchase", "commerce")
          .otherwise("other"))
      .groupBy($"event_class", $"ts".cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val byClass = Window.partitionBy($"event_class").orderBy($"day")
    classified.select(
        $"event_class", $"day", $"n",
        sum($"n").over(byClass.rowsBetween(
          Window.unboundedPreceding, Window.currentRow))
          .cast("long").as("cumulative"),
        sum($"n").over(byClass.rowsBetween(-6, 0))
          .cast("long").as("rolling_week"),
        ($"n".cast("double") / sum($"n").over(
          Window.partitionBy($"event_class").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
          .as("share_of_class"))
      .orderBy($"event_class", $"day")
  }

  /** Ordered-by-another-key DESC aggregation (reference A3:
    * `ARRAY_AGG(ROW(...) ORDER BY votes DESC NULLS LAST)`,
    * `homework/assignment.sql:50-53`): per customer, order ids listed
    * by price descending. Spark has no ORDER BY inside collect_list;
    * the equivalent is sort_array over struct(negated sort key,
    * payload) — negation in exact decimal so ties and order reproduce.
    */
  val q28_ordered_agg_desc: Q = Q(
    "q28_ordered_agg_desc",
    """SELECT o_custkey,
      |  STRING_AGG(CAST(o_orderkey AS VARCHAR), ','
      |    ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey)
      |    AS orders_by_price,
      |  COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .groupBy($"o_custkey")
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(
              (-money($"o_totalprice")).as("neg_price"),
              $"o_orderkey"))),
            x => x.getField("o_orderkey").cast("string")),
          ",").as("orders_by_price"),
        count(lit(1)).as("n_orders"))
      .orderBy($"o_custkey")
  }

  /** Ranking/distribution window breadth beyond lag/row_number:
    * NTILE, PERCENT_RANK, CUME_DIST, RANK/DENSE_RANK and the value
    * functions FIRST/LAST/NTH over explicit frames. percent_rank and
    * cume_dist are ratios of exact integers — deterministic doubles in
    * any engine. Total ordering (acctbal, custkey) keeps every value
    * function reproducible under ties.
    */
  val q29_window_ranks: Q = Q(
    "q29_window_ranks",
    """SELECT c_custkey, c_mktsegment,
      |  CAST(NTILE(4) OVER w AS INT) AS quartile,
      |  CAST(RANK() OVER w AS INT) AS rnk,
      |  CAST(DENSE_RANK() OVER w AS INT) AS drnk,
      |  PERCENT_RANK() OVER w AS pr,
      |  CUME_DIST() OVER w AS cd,
      |  FIRST_VALUE(c_custkey) OVER w AS poorest,
      |  LAST_VALUE(c_custkey) OVER
      |    (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |    AS richest,
      |  NTH_VALUE(c_custkey, 2) OVER
      |    (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |    AS runner_up
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_mktsegment, c_acctbal, c_custkey""".stripMargin) {
    (spark, dir) =>
    import spark.implicits._
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal", $"c_custkey")
    val wFull = w.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.load(spark, dir, "customer")
      .select($"c_custkey", $"c_mktsegment",
        ntile(4).over(w).as("quartile"),
        rank().over(w).cast("int").as("rnk"),
        dense_rank().over(w).cast("int").as("drnk"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        first_value($"c_custkey").over(w).as("poorest"),
        last_value($"c_custkey").over(wFull).as("richest"),
        nth_value($"c_custkey", 2).over(wFull).as("runner_up"))
      .orderBy($"c_mktsegment", $"c_custkey")
  }

  /** Forward fill (last observation carried forward): each event
    * carries the most recent purchase value seen so far for its user
    * — the sparse-column gap-filling every feature pipeline needs,
    * done with `last(col, ignoreNulls = true)` over a running frame
    * (one window pass, one shuffle on the user key; never a self-join
    * against "previous non-null"). Ordering is by event_id alone:
    * events.ts is ns-precision in the files and µs in Spark, so a
    * ts-ordered fill would diverge across engines on sub-µs ties.
    */
  val q80_forward_fill: Q = Q(
    "q80_forward_fill",
    """SELECT user_id, event_id,
      |  LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY event_id
      |          ROWS UNBOUNDED PRECEDING) AS last_purchase_value
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, dir, "events")
      .select($"user_id", $"event_id",
        last(when($"event_type" === "purchase", $"value"),
          ignoreNulls = true).over(w).as("last_purchase_value"))
      .orderBy($"user_id", $"event_id")
  }

  val all: Seq[Q] = Seq(
    q20_dedup_latest, q21_lag_daily, q22_running_sum, q23_frames,
    q24_ordered_collect, q25_topk_per_group, q26_longest_streak,
    q27_window_dashboard, q28_ordered_agg_desc, q29_window_ranks,
    q80_forward_fill)
}