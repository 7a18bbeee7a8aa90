package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Exact._
import graft.functions.TextFunctions._
import graft.operators.{Intervals, Salt}

/** Round-3 surface extensions: reshape operators (unpivot/melt, cube),
  * generator-with-ordinality, edit-distance near-dup, graph degree
  * distribution, TF–DF term scoring, sweep-line interval concurrency,
  * multi-touch attribution, weekly-grain array metrics, event-time
  * RANGE window frames, and a skew-salted join.
  */
object Extended {

  /** Wide→long melt via the DataFrame `unpivot` API (the inverse of
    * q61's pivot; Spark ≥3.4 surface). The wide frame is a per-priority
    * conditional-count pivot; unpivot restores (priority, status, n).
    */
  val q89_unpivot: Q = Q(
    "q89_unpivot",
    """WITH w AS (SELECT o_orderpriority,
      |    COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS f,
      |    COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o,
      |    COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p
      |  FROM orders GROUP BY 1)
      |SELECT o_orderpriority, 'F' AS o_orderstatus, f AS n_orders FROM w
      |UNION ALL
      |SELECT o_orderpriority, 'O', o FROM w
      |UNION ALL
      |SELECT o_orderpriority, 'P', p FROM w
      |ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(
        count(when($"o_orderstatus" === "F", 1)).as("F"),
        count(when($"o_orderstatus" === "O", 1)).as("O"),
        count(when($"o_orderstatus" === "P", 1)).as("P"))
      .unpivot(
        Array($"o_orderpriority"),
        Array($"F", $"O", $"P"),
        "o_orderstatus", "n_orders")
      .orderBy($"o_orderpriority", $"o_orderstatus")
  }

  /** Generator with ordinality: `posexplode` (reference UNNEST WITH
    * ORDINALITY, `array_metrics_analysis.sql:59`) — token position is
    * part of the output, not just the value.
    */
  val q90_pos_tokens: Q = Q(
    "q90_pos_tokens",
    """SELECT doc_id,
      |  CAST(generate_subscripts(toks, 1) - 1 AS INT) AS pos,
      |  unnest(toks) AS tok
      |FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
      |  FROM documents WHERE doc_id < 5) t
      |ORDER BY doc_id, pos""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .filter($"doc_id" < 5)
      .select($"doc_id", posexplode(lowerTokens($"text")).as(Seq("pos", "tok")))
      .orderBy($"doc_id", $"pos")
  }

  /** Edit-distance near-dup pairs: a bounded probe set against the
    * full `part` names with `levenshtein ≤ 2` — the string-metric
    * dedup modality alongside MinHash (q45), SimHash (q46) and
    * embedding cosine (q59). The probe side stays small and broadcast;
    * the full side streams, so the pair space is O(probe × n), never
    * O(n²).
    */
  val q91_edit_distance: Q = Q(
    "q91_edit_distance",
    """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
      |FROM part a JOIN part b ON a.p_partkey < b.p_partkey
      |WHERE a.p_partkey <= 50 AND levenshtein(a.p_name, b.p_name) <= 2
      |ORDER BY dist, id_a, id_b LIMIT 100""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    // LevenshteinBandRule rewrites the dist<=2 filter to a free
    // length-difference band + the early-exit threshold DP
    org.apache.spark.sql.graftbridge.Bridge.addOptimization(
      spark, graft.plans.LevenshteinBandRule)
    val p = Tables.load(spark, dir, "part").select($"p_partkey", $"p_name")
    val a = p.filter($"p_partkey" <= 50)
      .select($"p_partkey".as("id_a"), $"p_name".as("name_a"))
    val b = p.select($"p_partkey".as("id_b"), $"p_name".as("name_b"))
    a.join(b, $"id_a" < $"id_b")
      .withColumn("dist", levenshtein($"name_a", $"name_b"))
      .filter($"dist" <= 2)
      .select($"id_a", $"id_b", $"dist")
      .orderBy($"dist", $"id_a", $"id_b")
      .limit(100)
  }

  /** Degree distribution of the supplier–part bipartite graph: dedup
    * edges, count per-vertex degree, histogram the degrees — the
    * standard first look at any graph's shape, three hash
    * aggregations and no joins.
    */
  val q92_degree_hist: Q = Q(
    "q92_degree_hist",
    """WITH e AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
      |d AS (SELECT l_suppkey, COUNT(*) AS degree FROM e GROUP BY 1)
      |SELECT degree, COUNT(*) AS n_suppliers
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .select($"l_suppkey", $"l_partkey").distinct()
      .groupBy($"l_suppkey").agg(count(lit(1)).as("degree"))
      .groupBy($"degree").agg(count(lit(1)).as("n_suppliers"))
      .orderBy($"degree")
  }

  /** TF–DF term scoring: per-document term frequency joined with
    * corpus-wide document frequency — the TF-IDF plumbing with the
    * score kept in exact integer arithmetic (`tf·10⁶ div df`) so the
    * ranking is engine-independent (log-based IDF would hash-diverge
    * at the ulp). Two aggregations sharing one shuffle key, then a
    * broadcast-sized join back to the probe docs.
    */
  val q93_tf_df: Q = Q(
    "q93_tf_df",
    """WITH t AS (SELECT doc_id,
      |    unnest(string_split_regex(lower(text), '\s+')) AS tok
      |  FROM documents),
      |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t GROUP BY 1, 2),
      |dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1)
      |SELECT tf.doc_id, tf.tok, tf.tf, dfreq.df,
      |  (tf.tf * 1000000) // dfreq.df AS score
      |FROM tf JOIN dfreq USING (tok)
      |WHERE tf.doc_id < 5
      |ORDER BY doc_id, score DESC, tok LIMIT 50""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val tf = Tables.loadParallel(spark, dir, "documents")
      .select($"doc_id", explode(lowerTokens($"text")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
    tf.filter($"doc_id" < 5)
      .join(dfreq, "tok")
      .select($"doc_id", $"tok", $"tf", $"df",
        expr("(tf * 1000000) DIV df").as("score"))
      .orderBy($"doc_id", $"score".desc, $"tok")
      .limit(50)
  }

  /** Peak concurrent users per day by sweep line over per-user active
    * intervals (minute-truncated first/last event, exclusive end) —
    * interval algebra without the O(n²) overlap self-join; see
    * [[graft.operators.Intervals]].
    */
  val q94_concurrency: Q = Q(
    "q94_concurrency",
    """WITH iv AS (SELECT user_id, CAST(ts AS DATE) AS day,
      |    date_trunc('minute', MIN(ts)) AS s,
      |    date_trunc('minute', MAX(ts)) + INTERVAL 1 MINUTE AS e
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT day, s AS bdry, 1 AS d FROM iv
      |  UNION ALL SELECT day, e, -1 FROM iv),
      |r AS (SELECT day, SUM(d) OVER (PARTITION BY day ORDER BY bdry, d
      |    ROWS UNBOUNDED PRECEDING) AS run FROM b)
      |SELECT day, CAST(MAX(run) AS BIGINT) AS max_concurrent
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val iv = Tables.load(spark, dir, "events")
      .groupBy($"user_id", $"ts".cast("date").as("day"))
      .agg(
        date_trunc("minute", min($"ts")).as("start_m"),
        date_trunc("minute", max($"ts")).as("end_m0"))
      .withColumn("end_m", col("end_m0") + expr("INTERVAL 1 MINUTE"))
    Intervals.maxConcurrent(iv, Seq("day"), "start_m", "end_m")
      .orderBy($"day")
  }

  /** First-touch / last-touch attribution at day grain: every purchase
    * is attributed to the earliest and latest view/click by the same
    * user within the trailing 7 days (ties broken by event_id — total
    * order, engine-independent). One range join, one `min_by`/`max_by`
    * pass per purchase, then a count per channel; the same as-of shape
    * as q52 but aggregated into a marketing report.
    */
  val q95_attribution: Q = Q(
    "q95_attribution",
    """WITH p AS (SELECT event_id AS pid, user_id, CAST(ts AS DATE) AS pday
      |  FROM events WHERE event_type = 'purchase'),
      |t AS (SELECT event_id AS tid, user_id, CAST(ts AS DATE) AS tday, event_type
      |  FROM events WHERE event_type IN ('view', 'click')),
      |j AS (SELECT p.pid, t.event_type,
      |    ROW_NUMBER() OVER (PARTITION BY p.pid
      |      ORDER BY t.tday DESC, t.tid DESC) AS rn_l,
      |    ROW_NUMBER() OVER (PARTITION BY p.pid
      |      ORDER BY t.tday ASC, t.tid ASC) AS rn_f
      |  FROM p JOIN t ON p.user_id = t.user_id
      |    AND t.tday BETWEEN p.pday - 7 AND p.pday)
      |SELECT event_type AS channel,
      |  COUNT(CASE WHEN rn_l = 1 THEN 1 END) AS n_last_touch,
      |  COUNT(CASE WHEN rn_f = 1 THEN 1 END) AS n_first_touch
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val ev = Tables.load(spark, dir, "events")
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("pid"), $"user_id",
        $"ts".cast("date").as("pday"))
    val t = ev.filter($"event_type".isin("view", "click"))
      .select($"event_id".as("tid"), $"user_id".as("t_user"),
        $"ts".cast("date").as("tday"), $"event_type")
    val per = p.join(t,
        $"user_id" === $"t_user" &&
          $"tday".between(date_sub($"pday", 7), $"pday"))
      .groupBy($"pid")
      .agg(
        max_by($"event_type", struct($"tday", $"tid")).as("last_ch"),
        min_by($"event_type", struct($"tday", $"tid")).as("first_ch"))
    per
      .select(explode(array(
        struct(lit("last").as("kind"), $"last_ch".as("channel")),
        struct(lit("first").as("kind"), $"first_ch".as("channel")))).as("x"))
      .groupBy($"x.channel".as("channel"))
      .agg(
        count(when($"x.kind" === "last", 1)).as("n_last_touch"),
        count(when($"x.kind" === "first", 1)).as("n_first_touch"))
      .orderBy($"channel")
  }

  /** Weekly-grain array metrics: per (user, week) a 7-slot array of
    * daily event counts — the reference's monthly `array_metrics`
    * positional pattern (A7) at week grain, built with 7 conditional
    * sums instead of collect-then-fold so the aggregate is a
    * fixed-width map-side combine.
    */
  val q96_weekly_metrics: Q = Q(
    "q96_weekly_metrics",
    """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n
      |  FROM events WHERE user_id < 100 GROUP BY 1, 2),
      |w AS (SELECT user_id, CAST(date_trunc('week', day) AS DATE) AS week_start,
      |    CAST(datediff('day', CAST(date_trunc('week', day) AS DATE), day) AS INT) AS dow,
      |    n
      |  FROM daily)
      |SELECT user_id, week_start,
      |  array_to_string([
      |   CAST(SUM(CASE WHEN dow = 0 THEN n ELSE 0 END) AS BIGINT),
      |   CAST(SUM(CASE WHEN dow = 1 THEN n ELSE 0 END) AS BIGINT),
      |   CAST(SUM(CASE WHEN dow = 2 THEN n ELSE 0 END) AS BIGINT),
      |   CAST(SUM(CASE WHEN dow = 3 THEN n ELSE 0 END) AS BIGINT),
      |   CAST(SUM(CASE WHEN dow = 4 THEN n ELSE 0 END) AS BIGINT),
      |   CAST(SUM(CASE WHEN dow = 5 THEN n ELSE 0 END) AS BIGINT),
      |   CAST(SUM(CASE WHEN dow = 6 THEN n ELSE 0 END) AS BIGINT)], ',')
      |    AS daily_counts,
      |  CAST(SUM(n) AS BIGINT) AS n_week
      |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val daily = Tables.load(spark, dir, "events")
      .filter($"user_id" < 100)
      .groupBy($"user_id", $"ts".cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("week_start", date_trunc("week", $"day").cast("date"))
      .withColumn("dow", datediff($"day", $"week_start"))
    daily
      .groupBy($"user_id", $"week_start")
      .agg(
        sum(when($"dow" === 0, $"n").otherwise(0L)).as("_d0"),
        (1 to 6).map(i =>
          sum(when($"dow" === i, $"n").otherwise(0L)).as(s"_d$i")) :+
          sum($"n").as("n_week"): _*)
      .select($"user_id", $"week_start",
        array_join(array((0 to 6).map(i => col(s"_d$i")): _*), ",")
          .as("daily_counts"),
        $"n_week")
      .orderBy($"user_id", $"week_start")
  }

  /** Event-time RANGE frame: trailing 30-day spend per customer at
    * order grain — `rangeBetween` over a day-number ordering, so all
    * same-day rows enter the frame together (a ROWS frame would be
    * order-dependent under same-day ties). Complements q23's ROWS
    * frames.
    */
  val q97_range_frame: Q = Q(
    "q97_range_frame",
    """WITH o AS (SELECT o_custkey, o_orderkey,
      |    CAST(o_orderdate AS DATE) AS day,
      |    datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS day_num,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
      |  FROM orders WHERE o_custkey < 200)
      |SELECT o_custkey, o_orderkey, day,
      |  CAST(SUM(p) OVER (PARTITION BY o_custkey ORDER BY day_num
      |    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
      |FROM o ORDER BY o_custkey, day, o_orderkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"day_num")
      .rangeBetween(-29, 0)
    Tables.load(spark, dir, "orders")
      .filter($"o_custkey" < 200)
      .withColumn("day", $"o_orderdate".cast("date"))
      .withColumn("day_num",
        datediff($"day", lit("1990-01-01").cast("date")))
      .select($"o_custkey", $"o_orderkey", $"day",
        sum(money($"o_totalprice")).over(w).cast("double").as("spend_30d"))
      .orderBy($"o_custkey", $"day", $"o_orderkey")
  }

  /** Skew-salted join: the fact's join key has only 5 distinct values
    * (worst-case skew — every key is a hot key), so a plain shuffle
    * join puts a fifth of the table in one task. `Salt.saltedJoin`
    * splits each key 32 ways and replicates the small dimension; the
    * shuffle_hash hint keeps the demo honest by forbidding the
    * broadcast that would otherwise bypass the shuffle entirely.
    * Result is identical to the unsalted join (the oracle runs one).
    */
  val q98_salted_join: Q = Q(
    "q98_salted_join",
    """WITH d AS (SELECT event_type, MAX(value) AS max_v
      |  FROM events GROUP BY 1)
      |SELECT e.event_type,
      |  COUNT(CASE WHEN e.value > d.max_v / 2 THEN 1 END) AS n_above_half,
      |  COUNT(*) AS n_events
      |FROM events e JOIN d USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val ev = Tables.load(spark, dir, "events")
    val dim = ev.groupBy($"event_type").agg(max($"value").as("max_v"))
    Salt.saltedJoin(ev, dim.hint("shuffle_hash"),
        key = "event_type", saltFrom = "event_id", n = 32)
      .groupBy($"event_type")
      .agg(
        count(when($"value" > $"max_v" / 2, 1)).as("n_above_half"),
        count(lit(1)).as("n_events"))
      .orderBy($"event_type")
  }

  /** CUBE over (lang, source) with grouping labels — all four
    * aggregation levels in one Expand-based pass (DataFrame `.cube`,
    * completing the q7 GROUPING SETS / q74 ROLLUP family).
    */
  val q99_cube: Q = Q(
    "q99_cube",
    """SELECT COALESCE(lang, '(all)') AS lang,
      |  COALESCE(source, '(all)') AS source,
      |  CAST(GROUPING(lang) AS INT) * 2 + CAST(GROUPING(source) AS INT)
      |    AS grouping_level,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents
      |GROUP BY CUBE (lang, source)
      |ORDER BY 3, 1, 2""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .cube($"lang", $"source")
      .agg(
        (grouping($"lang").cast("int") * 2 +
          grouping($"source").cast("int")).as("grouping_level"),
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("total_chars"))
      .select(
        coalesce($"lang", lit("(all)")).as("lang"),
        coalesce($"source", lit("(all)")).as("source"),
        $"grouping_level", $"n_docs", $"total_chars")
      .orderBy($"grouping_level", $"lang", $"source")
  }

  val all: Seq[Q] = Seq(
    q89_unpivot, q90_pos_tokens, q91_edit_distance, q92_degree_hist,
    q93_tf_df, q94_concurrency, q95_attribution, q96_weekly_metrics,
    q97_range_frame, q98_salted_join, q99_cube)
}
