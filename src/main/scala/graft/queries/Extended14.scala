package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TDigest

/** Round-6 final tranche: the t-digest mergeable quantile state
  * ([[graft.functions.TDigest]]) exercised end-to-end — per-batch
  * digests maintained per key, merged across batches, estimates
  * checked against the exact rank envelope.
  */
object Extended14 {

  /** Incremental QUANTILES via mergeable t-digests — q110's
    * maintenance story (per-batch HLL sketches for COUNT DISTINCT)
    * extended to the other aggregate family with no algebraic
    * partial. Spark's own `percentile_approx` sketch is not exposed
    * as a reusable partial, so [[TDigest]] reimplements the published
    * t-digest algorithm (Dunning & Ertl 2019): each month digests
    * only its own orders into ≤~δ (mean, weight) centroids, the
    * per-key state in a maintained table stays a few KB forever, and
    * any period's p50/p95 reads back by re-clustering the union of
    * centroid sets — raw history is never rescanned. That is the
    * 100 TB design: the full-history alternative re-sorts every value
    * per refresh.
    *
    * Estimates are engine-specific and (sub-ε) merge-order-specific,
    * so — the q9/q66/q110 accuracy-envelope policy — the query emits
    * rank-envelope booleans: the merged estimate must land between
    * the exact p±0.05 continuous quantiles (p90..p99 for the p95
    * probe). The width is calibrated, not guessed: TDigestProps'
    * 30k-case adversarial sweep measured worst merged-digest rank
    * error 0.035 on continuous data at δ=100 — mid-range k₁ cluster
    * width 2π√(q(1−q))/δ, doubled across a merge — so ±0.02 would
    * flake and ±0.05 holds with headroom. The envelope bounds come
    * from [[graft.operators.Percentiles.exactCont]] (distributed rank
    * selection, bounded memory — NOT a value-buffering exact
    * `percentile()` aggregate) and broadcast into the sketch side.
    */
  val q236_tdigest_quantiles: Q = Q(
    "q236_tdigest_quantiles",
    """SELECT o_orderstatus, COUNT(*) AS n_orders,
      |  TRUE AS p50_ok, TRUE AS p95_ok
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val orders = Tables.load(spark, dir, "orders")
      .select($"o_orderstatus",
        date_trunc("month", $"o_orderdate").as("batch"),
        $"o_totalprice".cast("double").as("price"))
    // maintenance layer: one digest per (key, batch) — what a real
    // pipeline would persist and append to, per refresh
    val perBatch = orders
      .groupBy($"o_orderstatus", $"batch")
      .agg(TDigest.sketch(100)($"price").as("sk"),
        count(lit(1)).as("n"))
    // read layer: merge the maintained digests per key
    val merged = perBatch
      .groupBy($"o_orderstatus")
      .agg(
        TDigest.mergeQuantiles(100, Seq(0.5, 0.95))($"sk").as("est"),
        sum($"n").as("n_orders"))
    val bounds = graft.operators.Percentiles
      .exactCont(orders, "o_orderstatus", "price",
        Seq(0.45, 0.55, 0.90, 0.99))
      .groupBy($"o_orderstatus")
      .agg(
        max(when($"p" === 0.45, $"value")).as("p45"),
        max(when($"p" === 0.55, $"value")).as("p55"),
        max(when($"p" === 0.90, $"value")).as("p90"),
        max(when($"p" === 0.99, $"value")).as("p99"))
    merged.join(broadcast(bounds), Seq("o_orderstatus"))
      .select($"o_orderstatus", $"n_orders",
        ($"est".getItem(0) >= $"p45" && $"est".getItem(0) <= $"p55")
          .as("p50_ok"),
        ($"est".getItem(1) >= $"p90" && $"est".getItem(1) <= $"p99")
          .as("p95_ok"))
      .orderBy($"o_orderstatus")
  }

  /** TOKEN-weighted quantiles via the weighted t-digest
    * ([[TDigest.weightedQuantiles]]) — the sketch companion to q152's
    * exact weighted median, answering the question per-doc quantiles
    * get wrong: "what does the median TOKEN see", where each
    * document's chars-per-token density counts with its token mass.
    * One map-side-combined aggregate per language carries ≤~δ
    * centroids regardless of corpus size; the exact alternative
    * (q152's cumulative-weight window) re-sorts every distinct value
    * per refresh.
    *
    * Envelope policy (q236's, weighted): the estimate must land
    * between the exact weighted quantiles at p±0.07 — calibrated as
    * the weighted digest's measured 0.012 error beyond one atom plus
    * the heaviest document's token share (≤ 2.8% across SFs) plus
    * margin. The bounds side computes exact weighted quantiles by
    * q152's integer cross-multiply (cw·10⁴ ≥ bp·tw — no division),
    * pre-aggregated per (lang, value) so the cumulative window runs
    * over value cardinality; p95's upper bound caps at the maximum
    * value (p+0.07 > 1). All-integer verdict inputs except the
    * deterministic per-doc ratio itself.
    */
  val q237_weighted_digest: Q = Q(
    "q237_weighted_digest",
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(len(string_split_regex(lower(text), '\s+'))) AS BIGINT)
      |    AS total_tokens,
      |  TRUE AS wp50_ok, TRUE AS wp95_ok
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.loadParallel(spark, dir, "documents")
      .select($"lang", length($"text").cast("long").as("chars"),
        size(split(lower($"text"), "\\s+")).cast("long").as("w"))
      .select($"lang", $"w",
        ($"chars".cast("double") / $"w").as("v"))
    val approx = docs.groupBy($"lang")
      .agg(
        TDigest.weightedQuantiles(100, Seq(0.5, 0.95))($"v", $"w")
          .as("est"),
        count(lit(1)).as("n_docs"),
        sum($"w").as("total_tokens"))
    val perVal = docs.groupBy($"lang", $"v").agg(sum($"w").as("w"))
    val wc = Window.partitionBy($"lang").orderBy($"v")
    val wt = Window.partitionBy($"lang")
    val cum = perVal.select($"lang", $"v",
      sum($"w").over(wc).as("cw"), sum($"w").over(wt).as("tw"))
    def wq(bp: Int) =
      min(when($"cw" * 10000 >= lit(bp.toLong) * $"tw", $"v"))
    val bounds = cum.groupBy($"lang").agg(
      wq(4300).as("lo50"), wq(5700).as("hi50"),
      wq(8800).as("lo95"), max($"v").as("vmax"))
    approx.join(broadcast(bounds), Seq("lang"))
      .select($"lang", $"n_docs", $"total_tokens",
        ($"est".getItem(0) >= $"lo50" && $"est".getItem(0) <= $"hi50")
          .as("wp50_ok"),
        ($"est".getItem(1) >= $"lo95" && $"est".getItem(1) <= $"vmax")
          .as("wp95_ok"))
      .orderBy($"lang")
  }

  /** INCREMENTALLY-MAINTAINED exact heavy hitters — q127's two-pass
    * answer produced from per-period Misra–Gries summaries instead of
    * a fresh corpus-wide pass 1: each period persists only its
    * 512-counter map ([[graft.functions.MisraGries.summary]], one
    * map-side-combined aggregate over that period's tokens), the
    * periods' summaries merge with the Agarwal trim (driver-side here
    * — periods × 512 entries), and the merged candidate set keeps the
    * global n/(k+1) superset guarantee for ANY period split
    * (mergeable-summaries law, MisraGriesProps-proven). The exact
    * recount then touches only the ≤ 512 candidates, so the final
    * answer is EXACT and shares q127's direct full-vocabulary oracle
    * — the maintenance changed the work, not the result. At 100 TB: a
    * new period tokenizes only its own documents; history contributes
    * bounded summaries, never text.
    */
  val q238_mg_incremental: Q = Q(
    "q238_mg_incremental",
    """WITH t AS (SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
      |  FROM documents),
      |tot AS (SELECT COUNT(*) AS n FROM t)
      |SELECT tok, COUNT(*) AS cnt FROM t GROUP BY 1
      |HAVING COUNT(*) * 100 > (SELECT n FROM tot)
      |ORDER BY cnt DESC, tok""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.functions.{MisraGries, MisraGriesSummary}
    val toks = Tables.loadParallel(spark, dir, "documents")
      .select(($"doc_id" % 4).as("period"),
        explode(graft.functions.TextFunctions.lowerTokens($"text"))
          .as("tok"))
      .localCheckpoint()
    val total = toks.count()
    // maintenance layer: one bounded summary per period
    val perPeriod = toks.groupBy($"period")
      .agg(MisraGries.summary(512)($"tok").as("mg"))
      .select($"mg").collect()
    // merge the maintained summaries (periods × 512 entries, driver)
    val mg = new MisraGriesSummary(512)
    val merged = perPeriod.foldLeft(Map.empty[String, Long]) { (acc, r) =>
      mg.merge(acc, r.getMap[String, Long](0).toMap)
    }
    val cands = merged.keys.toSeq.sorted
    // exact recount of candidates only, real threshold
    toks.filter($"tok".isin(cands: _*))
      .groupBy($"tok")
      .agg(count(lit(1)).as("cnt"))
      .filter($"cnt" * 100 > total)
      .orderBy($"cnt".desc, $"tok")
  }

  val all: Seq[Q] =
    Seq(q236_tdigest_quantiles, q237_weighted_digest,
      q238_mg_incremental)
}
