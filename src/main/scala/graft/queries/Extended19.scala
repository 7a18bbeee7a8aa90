package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.{Bm25, LangModel, Winnow}

/** Round-7 tranche V: the retrieval / targeted-selection layer —
  * exact-integer BM25 top-k (lexical corpus slicing), DSIR-style
  * importance contrast between a target and a source language model
  * (Xie et al. 2023, rebuilt in the backoff LM's exact surprise
  * bits), and winnowing fingerprints (Schleimer et al. 2003 / MOSS)
  * with shared-fingerprint pair counts for overlap detection.
  *
  * Reference anchor: the curriculum's ranked top-N homework
  * (`3-spark-fundamentals`); the retrieval/selection operators are
  * the training-data extensions on top.
  */
object Extended19 {

  /** BM25 top-10 per query ([[Bm25.topK]]): queries = the distinct
    * token sets of docs 0–4, scored over the whole corpus. IDF in
    * clamped floor-bits, saturation cleared to the exact rational
    * 22·tf·T / (10·T·tf + 3·T + 9·dl·D), each term floored ONCE at
    * milli precision then summed (quantize-then-sum) — pure BIGINT,
    * ties broken (score desc, doc). The query-term and
    * query-restricted df tables broadcast; scoring is map-side to
    * the (qid, doc) combine; top-k is a per-qid WindowGroupLimit.
    */
  val q268_bm25_topk: Q = Q(
    "q268_bm25_topk",
    """WITH tok AS (SELECT doc_id AS doc,
      |    string_split_regex(lower(text), '\s+') AS t FROM documents),
      |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
      |    CAST(SUM(len(t)) AS BIGINT) AS tt FROM tok),
      |p AS (SELECT doc, CAST(len(t) AS BIGINT) AS dl, unnest(t) AS w
      |  FROM tok),
      |po AS (SELECT doc, dl, w, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM p GROUP BY 1, 2, 3),
      |dft AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM po
      |  GROUP BY 1),
      |q AS (SELECT DISTINCT doc AS qid, w FROM p WHERE doc < 5),
      |sc AS (SELECT q.qid, po.doc,
      |    GREATEST((length(bin(2 * st.nd - 2 * dft.df + 1)) - 1)
      |      - (length(bin(2 * dft.df + 1)) - 1), 0) AS ib,
      |    po.tf, po.dl, st.tt, st.nd
      |  FROM q JOIN po USING (w) JOIN dft USING (w) CROSS JOIN st),
      |t AS (SELECT qid, doc,
      |    CAST(SUM((1000 * ib * 22 * CAST(tf AS HUGEINT) * tt)
      |      // (10 * CAST(tt AS HUGEINT) * tf + 3 * tt + 9 * dl * nd))
      |      AS BIGINT) AS score_milli,
      |    CAST(COUNT(*) AS BIGINT) AS n_terms
      |  FROM sc GROUP BY 1, 2),
      |r AS (SELECT qid, doc, score_milli, n_terms,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
      |      ORDER BY score_milli DESC, doc) AS BIGINT) AS rnk FROM t)
      |SELECT qid, doc, score_milli, n_terms, rnk FROM r
      |WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin) {
    (spark, dir) =>
    import spark.implicits._
    val docs = Tables.loadParallel(spark, dir, "documents")
    val queries = docs.filter($"doc_id" < 5)
      .select($"doc_id".as("qid"),
        explode(TextFunctions.lowerTokens($"text")).as("w"))
      .distinct()
    Bm25.topK(docs, "doc_id", $"text", queries, 10)
      .orderBy($"qid", $"rnk")
  }

  private[queries] def lmCtes(p: String, where: String): String =
    s"""${p}tok AS (SELECT unnest(string_split_regex(lower(text),
      |    '\\s+')) AS w FROM documents $where),
      |${p}tr AS (SELECT unnest(t[:-2]) AS w1, unnest(t[2:]) AS w2
      |  FROM (SELECT string_split_regex(lower(text), '\\s+') AS t
      |        FROM documents $where) x
      |  WHERE len(t) >= 2),
      |${p}uni0 AS (SELECT w, COUNT(*) AS c FROM ${p}tok GROUP BY 1),
      |${p}uni AS (SELECT w, c FROM ${p}uni0
      |  ORDER BY c DESC, w LIMIT 24),
      |${p}bi AS (SELECT b.w1, b.w2, b.c12, u.c AS c1
      |  FROM (SELECT w1, w2, COUNT(*) AS c12 FROM ${p}tr GROUP BY 1, 2
      |        ORDER BY COUNT(*) DESC, w1, w2 LIMIT 512) b
      |  JOIN ${p}uni0 u ON u.w = b.w1),
      |${p}k AS (SELECT CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS v
      |  FROM ${p}uni)""".stripMargin

  /** The q270 winnowing pair chain (tokens → k-gram hashes →
    * window-then-filter argmin → df-capped fingerprint index →
    * shared-count pairs), shared with the q279 community query: the
    * window min is computed over ALL keyed rows in `selw` and the
    * complete-window filter `i <= nh - 3` applies OUTSIDE it (SQL
    * evaluates WHERE before window functions — filtering inside the
    * window block truncated the tail frames, the round-7 red row).
    * Ends with CTE `pairs(a, b, shared)`.
    */
  private[queries] val winnowPairCtes: String =
    """tok AS (SELECT doc_id AS doc,
      |    string_split_regex(lower(text), '\s+') AS t FROM documents),
      |g AS (SELECT doc, len(t) - 4 AS nh, t,
      |    unnest(range(1, greatest(len(t) - 4, 0) + 1)) AS i FROM tok),
      |occ AS (SELECT doc, nh, i,
      |    ('0x' || substr(md5(array_to_string(t[i:i+4], ' ')), 1, 15))
      |      ::BIGINT AS hv FROM g),
      |keyed AS (SELECT doc, nh, i,
      |    printf('%016x:%09d', hv, i) AS key FROM occ),
      |selw AS (SELECT doc, nh, i, MIN(key) OVER (PARTITION BY doc
      |      ORDER BY i ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
      |      AS sel
      |  FROM keyed),
      |sel AS (SELECT DISTINCT doc, sel FROM selw WHERE i <= nh - 3),
      |fps AS (SELECT DISTINCT doc,
      |    ('0x' || substr(sel, 1, 16))::BIGINT AS fp FROM sel),
      |keep AS (SELECT fp FROM fps GROUP BY fp
      |  HAVING COUNT(*) BETWEEN 2 AND 20),
      |kept AS (SELECT f.doc, f.fp FROM fps f JOIN keep USING (fp)),
      |pairs AS (SELECT x.doc AS a, y.doc AS b,
      |    CAST(COUNT(*) AS BIGINT) AS shared
      |  FROM kept x JOIN kept y ON x.fp = y.fp AND x.doc < y.doc
      |  GROUP BY 1, 2)""".stripMargin

  private[queries] def bitsSql(p: String, alias: String): String =
    s"""CASE WHEN ${alias}b.c12 IS NOT NULL
      |  THEN (length(bin(${alias}b.c1)) - 1)
      |    - (length(bin(${alias}b.c12)) - 1)
      |  ELSE 1 + (length(bin((SELECT n FROM ${p}k)
      |      + (SELECT v FROM ${p}k))) - 1)
      |    - (length(bin(COALESCE(${alias}u.c, 0) + 1)) - 1)
      |  END""".stripMargin

  /** DSIR-style importance selection ([[LangModel.contrastBits]]):
    * target backoff LM trained on the `lang = 'en'` slice, source LM
    * on the whole corpus (both pruned uni 24 / bi 512 — the q240
    * cuts, so pruning BINDS at every SF), every document scored under
    * BOTH models in one transition pass (all four pruned tables
    * broadcast), importance `w_bits = s_bits − t_bits` exact integer.
    * Top-100 most target-like documents (w_bits desc, doc_id).
    */
  val q269_dsir_select: Q = Q(
    "q269_dsir_select",
    s"""WITH ${lmCtes("t", "WHERE lang = 'en'")},
      |${lmCtes("s", "")},
      |dtr AS (SELECT doc_id, lang, unnest(t[:-2]) AS w1,
      |    unnest(t[2:]) AS w2
      |  FROM (SELECT doc_id, lang,
      |        string_split_regex(lower(text), '\\s+') AS t
      |        FROM documents) x WHERE len(t) >= 2),
      |sc AS (SELECT doc_id, lang,
      |    ${bitsSql("t", "t")} AS bt,
      |    ${bitsSql("s", "s")} AS bs
      |  FROM dtr
      |  LEFT JOIN tbi tb ON dtr.w1 = tb.w1 AND dtr.w2 = tb.w2
      |  LEFT JOIN tuni tu ON dtr.w2 = tu.w
      |  LEFT JOIN sbi sb ON dtr.w1 = sb.w1 AND dtr.w2 = sb.w2
      |  LEFT JOIN suni su ON dtr.w2 = su.w),
      |doc AS (SELECT doc_id, lang,
      |    CAST(SUM(bt) AS BIGINT) AS t_bits,
      |    CAST(SUM(bs) AS BIGINT) AS s_bits,
      |    CAST(COUNT(*) AS BIGINT) AS d_n
      |  FROM sc GROUP BY 1, 2)
      |SELECT doc_id, lang, t_bits, s_bits, d_n,
      |  s_bits - t_bits AS w_bits
      |FROM doc ORDER BY w_bits DESC, doc_id LIMIT 100""".stripMargin) {
    (spark, dir) =>
    import spark.implicits._
    val docs = Tables.loadParallel(spark, dir, "documents")
      .select($"doc_id", $"lang", $"text")
    // target/source trained from ONE corpus read per stage (fused
    // conditional aggregation — LangModel.trainBigramPair; identical
    // tables to the two-pass composition, LangModelPairSpec)
    val (target, source) = LangModel.trainBigramPair(
      docs, $"lang" === "en", $"text", biK = 512, uniK = 24)
    LangModel.contrastBits(docs, Seq("doc_id", "lang"), $"text",
        target, source)
      .orderBy($"w_bits".desc, $"doc_id")
      .limit(100)
  }

  /** Winnowing overlap detection ([[Winnow]]): 5-gram hashes, window
    * w = 4 (any shared run of ≥ 8 tokens guarantees a shared
    * fingerprint), per-window (hash, pos) argmin via the fixed-width
    * string key, stop-gram cap maxDf = 20, top-30 document pairs by
    * shared-fingerprint count. Text never shuffles — the index moves
    * (doc, pos, 60-bit long) rows only.
    */
  val q270_winnow_overlap: Q = Q(
    "q270_winnow_overlap",
    s"""WITH $winnowPairCtes
      |SELECT a, b, shared FROM pairs
      |ORDER BY shared DESC, a, b LIMIT 30""".stripMargin) {
    (spark, dir) =>
    import spark.implicits._
    val fps = Winnow.fingerprints(
      Tables.loadParallel(spark, dir, "documents"),
      "doc_id", "text", k = 5, w = 4)
    Winnow.sharedFingerprints(fps, maxDf = 20)
      .orderBy($"shared".desc, $"a", $"b")
      .limit(30)
  }

  val all: Seq[Q] = Seq(q268_bm25_topk, q269_dsir_select,
    q270_winnow_overlap)
}
