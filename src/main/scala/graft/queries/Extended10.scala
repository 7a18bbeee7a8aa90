package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Distributional

/** Round-6 additions: the distributional-scoring toolkit a pretraining
  * data pipeline runs between raw crawl and tokenizer — DSIR-style
  * importance scoring against a target domain, CCNet-style per-language
  * LM-surprisal bucketing, and pairwise source-distribution KL drift.
  * Kernels live in [[graft.operators.Distributional]] (property-tested
  * against driver-side reference folds in DistributionalProps); the
  * queries here add the ranking/rollup shells and carry the DuckDB
  * oracles.
  *
  * Shared determinism discipline: token/char statistics are exact
  * integer counts; the single transcendental step (ln of a ratio of
  * those integers) is floored to integer milli-nats PER MODEL CELL,
  * and everything downstream — per-document sums, KL accumulations,
  * rankings — is integer arithmetic, so no floating-point
  * summation-order can diverge between Spark and the DuckDB oracle.
  * (A cross-engine 1-ulp `ln` difference only matters if ln(ratio)·10⁶
  * lands within that ulp of an integer boundary: ~1e-10 per distinct
  * model cell, verified empirically at all 3 SFs.)
  */
object Extended10 {
  import org.apache.spark.sql.expressions.Window

  private val B = Distributional.DefaultBuckets

  /** DSIR importance resampling (Xie et al. 2023): score every
    * non-target document by the log-likelihood ratio of its hashed
    * unigrams under a target-domain model vs the raw-pool model, both
    * add-one smoothed over the B-bucket feature space; keep the top 25.
    * At 100 TB the only wide shuffles are two map-side-combined
    * aggregates keyed on (bucket) and (doc_id); the 4096-row LLR model
    * broadcasts into the scoring pass.
    */
  val q217_dsir_importance: Q = Q(
    "q217_dsir_importance",
    s"""WITH tok AS (SELECT doc_id, source,
      |    source IN ('src0', 'src1') AS is_tgt,
      |    ('0x' || substr(md5(w), 1, 15))::BIGINT % $B AS b
      |  FROM (SELECT doc_id, source,
      |          unnest(string_split_regex(lower(text), '\\s+')) AS w
      |        FROM documents) t),
      |m AS (SELECT b,
      |    SUM(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS tc,
      |    SUM(CASE WHEN is_tgt THEN 0 ELSE 1 END) AS rc
      |  FROM tok GROUP BY 1),
      |tots AS (SELECT SUM(tc) AS tt, SUM(rc) AS rt FROM m),
      |llr AS (SELECT b, CAST(floor(ln(
      |      CAST((tc + 1) * (rt + $B) AS DOUBLE) /
      |      CAST((rc + 1) * (tt + $B) AS DOUBLE)) * 1000000) AS BIGINT)
      |    AS mnat
      |  FROM m CROSS JOIN tots)
      |SELECT doc_id, source, score_mnat, n_toks
      |FROM (SELECT tok.doc_id, tok.source,
      |    CAST(SUM(mnat) AS BIGINT) AS score_mnat,
      |    COUNT(*) AS n_toks
      |  FROM tok JOIN llr USING (b) WHERE NOT is_tgt
      |  GROUP BY 1, 2) s
      |ORDER BY score_mnat DESC, doc_id LIMIT 25""".stripMargin) {
    (spark, dir) =>
    import spark.implicits._
    Distributional.dsirScores(
        Tables.loadParallel(spark, dir, "documents")
          .select($"doc_id", $"source", $"text"),
        isTarget = $"source".isin("src0", "src1"), b = B)
      .orderBy($"score_mnat".desc, $"doc_id")
      .limit(25)
  }

  /** CCNet-style head/middle/tail bucketing: a per-language character
    * BIGRAM model (conditional surprisal −ln P(c₂|c₁) in floored
    * milli-nats) scores every document's average surprisal, and
    * NTILE(3) per language splits head(1)/middle(2)/tail(3). The model
    * is charset²-bounded; the doc score is one broadcastable join over
    * the bigram stream plus a (doc_id)-keyed combine.
    */
  val q218_surprisal_buckets: Q = Q(
    "q218_surprisal_buckets",
    """WITH bg AS (SELECT doc_id, lang, substr(text, i, 2) AS g
      |  FROM (SELECT doc_id, lang, text,
      |          unnest(range(1, length(text))) AS i
      |        FROM documents WHERE length(text) >= 2) t),
      |bc AS (SELECT lang, g, COUNT(*) AS n FROM bg GROUP BY 1, 2),
      |cc AS (SELECT lang, substr(g, 1, 1) AS c, SUM(n) AS cn
      |  FROM bc GROUP BY 1, 2),
      |s AS (SELECT bc.lang, g, CAST(floor(ln(
      |      CAST(cn AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000) AS BIGINT)
      |    AS mnat
      |  FROM bc JOIN cc ON cc.lang = bc.lang AND cc.c = substr(bc.g, 1, 1)),
      |d AS (SELECT bg.doc_id, bg.lang, SUM(mnat) AS tot, COUNT(*) AS n_bg
      |  FROM bg JOIN s ON s.lang = bg.lang AND s.g = bg.g
      |  GROUP BY 1, 2),
      |k AS (SELECT lang, CAST(tot // n_bg AS BIGINT) AS avg_mnat,
      |    NTILE(3) OVER (PARTITION BY lang
      |      ORDER BY tot // n_bg, doc_id) AS bucket
      |  FROM d)
      |SELECT lang, CAST(bucket AS INT) AS bucket, COUNT(*) AS n_docs,
      |  MIN(avg_mnat) AS min_mnat, MAX(avg_mnat) AS max_mnat
      |FROM k GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val w = Window.partitionBy($"lang").orderBy($"avg_mnat", $"doc_id")
    Distributional.surprisal(
        Tables.loadParallel(spark, dir, "documents")
          .select($"doc_id", $"lang", $"text"))
      .withColumn("bucket", ntile(3).over(w))
      .groupBy($"lang", $"bucket")
      .agg(count(lit(1)).as("n_docs"), min($"avg_mnat").as("min_mnat"),
        max($"avg_mnat").as("max_mnat"))
      .orderBy($"lang", $"bucket")
  }

  /** Pairwise source-distribution drift: KL(p‖q) between the hashed
    * unigram distributions of sources src0–src4, add-one smoothed over
    * the dense B-bucket grid. Reported as the exact integer
    * Σ_b (n_p(b)+1)·⌊ln(p(b)/q(b))·10⁶⌋ — KL scaled by (tot_p+B)·10⁶ —
    * so the accumulation is order-free. The grid is (sources × B) rows,
    * bounded by construction; the only corpus-wide work is the one
    * token-count aggregate.
    */
  val q219_source_kl: Q = Q(
    "q219_source_kl",
    s"""WITH tok AS (SELECT source,
      |    ('0x' || substr(md5(w), 1, 15))::BIGINT % $B AS b
      |  FROM (SELECT source,
      |          unnest(string_split_regex(lower(text), '\\s+')) AS w
      |        FROM documents
      |        WHERE source IN ('src0','src1','src2','src3','src4')) t),
      |c AS (SELECT source, b, COUNT(*) AS n FROM tok GROUP BY 1, 2),
      |t AS (SELECT source, SUM(n) AS tot FROM c GROUP BY 1),
      |grid AS (SELECT t.source, t.tot, r.b
      |  FROM t CROSS JOIN (SELECT unnest(range($B)) AS b) r),
      |d AS (SELECT grid.source, grid.tot, grid.b, COALESCE(c.n, 0) AS n
      |  FROM grid LEFT JOIN c ON c.source = grid.source AND c.b = grid.b)
      |SELECT p.source AS src_p, q.source AS src_q,
      |  CAST(SUM((p.n + 1) * CAST(floor(ln(
      |      CAST((p.n + 1) * (q.tot + $B) AS DOUBLE) /
      |      CAST((q.n + 1) * (p.tot + $B) AS DOUBLE)) * 1000000) AS BIGINT))
      |    AS BIGINT) AS kl_scaled
      |FROM d p JOIN d q ON p.b = q.b AND p.source <> q.source
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Distributional.sourceKl(
        Tables.loadParallel(spark, dir, "documents")
          .filter($"source".isin("src0", "src1", "src2", "src3", "src4"))
          .select($"source", $"text"), b = B)
      .orderBy($"src_p", $"src_q")
  }

  val all: Seq[Q] = Seq(
    q217_dsir_importance, q218_surprisal_buckets, q219_source_kl)
}
