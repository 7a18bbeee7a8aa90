package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Exact._
import graft.operators.{Graph, RangeJoin}

/** Join surface (SURVEY §2.3): inner/left/semi/anti equi-joins,
  * broadcast dims, non-equi residuals, cross join, funnel self-join
  * rewritten shuffle-free.
  *
  * Scale notes: dimension tables (region 5, nation 25, supplier ~SF*100)
  * are broadcast — at 100 TB the fact side streams through a
  * BroadcastHashJoin with zero shuffle of the big side. Fact-fact joins
  * (orders⋈lineitem) shuffle on the join key once; Catalyst's AQE picks
  * sort-merge vs shuffled-hash from runtime sizes.
  */
object Joins {

  /** Inner equi-join fact⋈dim + agg (reference J1:
    * `window_based_analysis.sql:17-18`).
    */
  val q10_join_inner: Q = Q(
    "q10_join_inner",
    """SELECT c_mktsegment,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    orders.join(customer, $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("revenue"))
      .orderBy($"c_mktsegment")
  }

  /** 5-way star join, dims explicitly broadcast (reference J11 + the
    * TPC-H Q5 shape): revenue per nation per region.
    */
  val q11_join_star: Q = Q(
    "q11_join_star",
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val li = Tables.load(spark, dir, "lineitem")
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    val nation = Tables.load(spark, dir, "nation")
    val region = Tables.load(spark, dir, "region")
    // eager aggregation below the fact-fact join: reduce lineitem to
    // one partial (revenue, count) row per order BEFORE shuffling —
    // map-side combine is strong because lineitem arrives clustered by
    // orderkey, so the join exchange moves ~|orders| narrow rows
    // instead of ~4× as many wide ones. Catalyst does not push
    // aggregates through joins; the rewrite is exact because decimal
    // sum-of-sums ≡ sum (and count-of-counts ≡ count) — the same
    // mergeable-partials law as IncrementalAgg/q103.
    val liPerOrder = li
      .groupBy($"l_orderkey")
      .agg(
        sum(money($"l_extendedprice") * (lit(1) - money($"l_discount")))
          .as("_rev"),
        count(lit(1)).as("_n"))
    liPerOrder.join(orders, $"l_orderkey" === $"o_orderkey")
      // customer grows with SF — no forced broadcast (AQE broadcasts it
      // while small, hash-joins it when it is not); nation/region stay
      // hinted: their cardinality is fixed by the schema
      .join(customer, $"o_custkey" === $"c_custkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        dsumRaw($"_rev").as("revenue"),
        sum($"_n").as("n_lines"))
      .orderBy($"r_name", $"n_name")
  }

  /** Left outer join keeping customers without orders (reference J2). */
  val q12_join_left: Q = Q(
    "q12_join_left",
    """SELECT c_mktsegment,
      |  COUNT(*) AS n_customers,
      |  COUNT(o_orderkey) AS n_orders,
      |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orderless
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    customer.join(orders, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("n_customers"),
        count($"o_orderkey").as("n_orders"),
        sum(when($"o_orderkey".isNull, 1).otherwise(0)).as("n_orderless"))
      .orderBy($"c_mktsegment")
  }

  /** Left semi join = EXISTS (reference J10:
    * `homework/assignment.sql:70-74`): customers with at least one open
    * order, counted per segment.
    */
  val q13_join_semi: Q = Q(
    "q13_join_semi",
    """SELECT c_mktsegment, COUNT(*) AS n_customers
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val customer = Tables.load(spark, dir, "customer")
    val open = Tables.load(spark, dir, "orders")
      .filter($"o_orderstatus" === "O")
    customer.join(open, $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  /** Left anti join = NOT EXISTS (reference J9:
    * `incremental_scd_query.sql:84-87`): customers who never placed an
    * urgent order.
    */
  val q14_join_anti: Q = Q(
    "q14_join_anti",
    """SELECT c_mktsegment, COUNT(*) AS n_customers
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val customer = Tables.load(spark, dir, "customer")
    val urgent = Tables.load(spark, dir, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
    customer.join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  /** Funnel conversion (reference J7, `funnel_analysis.sql:17-21`). The
    * reference uses a time-ordered self-join; "a purchase after some
    * view" ≡ "max(purchase ts) > min(view ts)", so we rewrite to a
    * single aggregation — one shuffle on user_id instead of an O(n²)
    * self-join. At 100 TB the self-join is the classic scale trap; this
    * form is linear.
    */
  val q15_funnel: Q = Q(
    "q15_funnel",
    """SELECT COUNT(*) AS n_converted FROM (
      |  SELECT user_id FROM events
      |  GROUP BY user_id
      |  HAVING max(CASE WHEN event_type = 'purchase' THEN ts END)
      |       > min(CASE WHEN event_type = 'view' THEN ts END)
      |) t""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .groupBy($"user_id")
      .agg(
        max(when($"event_type" === "purchase", $"ts")).as("last_purchase"),
        min(when($"event_type" === "view", $"ts")).as("first_view"))
      .filter($"last_purchase" > $"first_view")
      .agg(count(lit(1)).as("n_converted"))
  }

  /** Equi key + range residual join (reference J8/J7 residual form):
    * lineitems shipped more than 90 days after the order date.
    */
  val q16_join_range: Q = Q(
    "q16_join_range",
    """SELECT l_linestatus, COUNT(*) AS n_late,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS late_value
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val li = Tables.load(spark, dir, "lineitem")
    val orders = Tables.load(spark, dir, "orders")
    li.join(orders, $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"))
      .groupBy($"l_linestatus")
      .agg(count(lit(1)).as("n_late"), dsum($"l_extendedprice").as("late_value"))
      .orderBy($"l_linestatus")
  }

  /** Self theta-join building co-occurrence pairs (reference J6,
    * `player_player_edges.sql:22-26`): supplier pairs that ship the
    * same part, deduped with key ordering. Distinct (part, supplier)
    * first shrinks the join input (reference A9 dedup-before-join).
    */
  val q17_join_pairs: Q = Q(
    "q17_join_pairs",
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      |SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b,
      |       COUNT(*) AS shared_parts
      |FROM ps a JOIN ps b
      |  ON a.l_partkey = b.l_partkey AND a.l_suppkey > b.l_suppkey
      |GROUP BY 1, 2
      |HAVING COUNT(*) >= 3
      |ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    // generated pairs instead of the reference's self-join — see
    // Graph.coPairs for the full shape + scale rationale
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // 1000 suppliers ⇒ ~500k distinct pair keys over 8.7M instances
    // at sf0.1: measured neutral between the combine and
    // repartition-first regimes — stay with the default
    Graph.coPairs(Tables.load(spark, dir, "lineitem"),
        $"l_partkey", $"l_suppkey", shufflePartitions, packKey = true,
        spreadGeneration = true)
      .select($"item_b".as("supp_a"), $"item_a".as("supp_b"),
        $"n".as("shared_parts"))
      .filter($"shared_parts" >= 3)
      .orderBy($"supp_a", $"supp_b")
  }

  /** Explicit cross join (reference J14/J4): full region × order-status
    * matrix with observed counts (zero-filled via left join).
    */
  val q18_cross_join: Q = Q(
    "q18_cross_join",
    """WITH m AS (SELECT r_name, s FROM region
      |           CROSS JOIN (SELECT DISTINCT o_orderstatus AS s FROM orders) t),
      |  obs AS (SELECT r_name, o_orderstatus AS s, COUNT(*) AS n
      |          FROM orders
      |          JOIN customer ON o_custkey = c_custkey
      |          JOIN nation ON c_nationkey = n_nationkey
      |          JOIN region ON n_regionkey = r_regionkey
      |          GROUP BY 1, 2)
      |SELECT m.r_name, m.s AS order_status, COALESCE(obs.n, 0) AS n_orders
      |FROM m LEFT JOIN obs ON m.r_name = obs.r_name AND m.s = obs.s
      |ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val region = Tables.load(spark, dir, "region")
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    val nation = Tables.load(spark, dir, "nation")
    val statuses = orders.select($"o_orderstatus".as("s")).distinct()
    val matrix = region.select($"r_name").crossJoin(statuses)
    val obs = orders
      // customer grows with SF — no forced broadcast (AQE broadcasts it
      // while small, hash-joins it when it is not); nation/region stay
      // hinted: their cardinality is fixed by the schema
      .join(customer, $"o_custkey" === $"c_custkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name".as("obs_r"), $"o_orderstatus".as("obs_s"))
      .agg(count(lit(1)).as("n"))
    matrix.join(obs,
        matrix("r_name") === $"obs_r" && matrix("s") === $"obs_s", "left")
      .select(matrix("r_name"), matrix("s").as("order_status"),
        coalesce($"n", lit(0L)).as("n_orders"))
      .orderBy($"r_name", $"order_status")
  }

  /** Point-in-interval join through the custom
    * [[graft.operators.RangeJoin]] operator (logical node → planner
    * strategy → BroadcastRangeJoinExec): orders land in calendar-month
    * windows plus one all-time window (so every order matches two
    * intervals — genuine multi-match range semantics, not a disguised
    * equi join). Stock Spark plans the BETWEEN join as
    * BroadcastNestedLoopJoin, probing every interval per order; the
    * custom exec binary-searches the sorted broadcast intervals —
    * O(log m) per row, the 100 TB-safe shape.
    */
  val q68_range_interval_join: Q = Q(
    "q68_range_interval_join",
    """WITH pts AS (SELECT o_totalprice,
      |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS INT) AS pday
      |  FROM orders),
      |months AS (SELECT
      |    strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m') AS label,
      |    CAST(CAST(date_trunc('month', o_orderdate) AS DATE) - DATE '1970-01-01' AS INT) AS lo,
      |    CAST(last_day(CAST(o_orderdate AS DATE)) - DATE '1970-01-01' AS INT) AS hi
      |  FROM orders GROUP BY 1, 2, 3),
      |allw AS (SELECT 'all' AS label, MIN(pday) AS lo, MAX(pday) AS hi FROM pts),
      |iv AS (SELECT * FROM months UNION ALL SELECT * FROM allw)
      |SELECT label, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM pts JOIN iv ON pts.pday BETWEEN iv.lo AND iv.hi
      |GROUP BY label ORDER BY label""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val epoch = lit("1970-01-01").cast("date")
    val orders = Tables.load(spark, dir, "orders")
    val pts = orders.select($"o_totalprice",
      datediff($"o_orderdate", epoch).as("pday"))
    val months = orders
      .groupBy(
        date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM")
          .as("label"),
        datediff(date_trunc("month", $"o_orderdate").cast("date"), epoch)
          .as("lo"),
        datediff(last_day($"o_orderdate"), epoch).as("hi"))
      .agg(count(lit(1)))
      .select($"label", $"lo", $"hi")
    val allWindow = pts.agg(
        min($"pday").as("lo"), max($"pday").as("hi"))
      .select(lit("all").as("label"), $"lo", $"hi")
    val intervals = months.unionByName(allWindow)
    RangeJoin.pointInInterval(pts, intervals, $"pday", $"lo", $"hi")
      .groupBy($"label")
      .agg(count(lit(1)).as("n_orders"),
        dsum($"o_totalprice").as("revenue"))
      .orderBy($"label")
  }

  /** Typed Dataset pipeline (reference S2/J13, `DatasetApi.ipynb`):
    * `as[Order] joinWith as[Customer] → map` to a result case class,
    * then back to the relational surface for aggregation. The typed
    * map inserts deliberate Serialize/Deserialize boundaries — the
    * trade the reference demonstrates (DataFrame stays in Tungsten,
    * `Dataset.map` drops to JVM objects); the oracle proves the typed
    * path computes exactly what the relational one does.
    */
  val q85_typed_pipeline: Q = Q(
    "q85_typed_pipeline",
    """SELECT c_mktsegment AS segment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderstatus = 'F'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.core.Models.{Customer, Order, OrderWithCustomer}
    val orders = Tables.load(spark, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        $"o_totalprice", $"o_orderdate".cast("timestamp").as("o_orderdate"),
        $"o_orderpriority")
      .as[Order]
    val customers = Tables.load(spark, dir, "customer")
      .select($"c_custkey", $"c_name",
        $"c_nationkey".cast("int").as("c_nationkey"),
        $"c_acctbal", $"c_mktsegment")
      .as[Customer]
    orders
      .filter((o: Order) => o.o_orderstatus == "F")
      .joinWith(customers, $"o_custkey" === $"c_custkey", "inner")
      .map { case (o, c) =>
        OrderWithCustomer(o.o_orderkey, o.o_totalprice, c.c_name,
          c.c_mktsegment)
      }
      .groupBy($"segment")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("revenue"))
      .orderBy($"segment")
  }

  val all: Seq[Q] = Seq(
    q10_join_inner, q11_join_star, q12_join_left, q13_join_semi,
    q14_join_anti, q15_funnel, q16_join_range, q17_join_pairs,
    q18_cross_join, q68_range_interval_join, q85_typed_pipeline)
}