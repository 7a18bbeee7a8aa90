package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

/** Round-8 additions: per-document repetition quality rules (the
  * Gopher-style gates a pretraining corpus filter applies), a BPE
  * pair-statistics pass (the inner loop of tokenizer induction), and
  * contrastive hard-negative mining over the embedding table.
  */
object Extended9 {
  import org.apache.spark.sql.expressions.Window

  /** Per-document repetition rules, rolled up per source — the
    * Gopher/C4 repetition gates adapted to exact integers: a doc is
    * flagged when its duplicate-word fraction (1 − distinct/total)
    * or its top-word share exceeds a basis-point threshold. Both
    * metrics derive from ONE (doc, token-hash) frequency aggregate.
    *
    * Scale shape: tokens hash to 60-bit longs inside the scan (the
    * fused md5-prefix kernel, q193 discipline), so the corpus-wide
    * shuffle moves (long doc_id, long hv) pairs with map-side
    * combine — text never shuffles. The same hash runs in the oracle,
    * so a collision (≈ n²/2⁶¹ per doc, vanishing at any SF) would
    * change both engines identically: parity holds by construction.
    */
  val q197_repetition_rules: Q = Q(
    "q197_repetition_rules",
    """WITH tok AS (SELECT doc_id, source,
      |    ('0x' || substr(md5(w), 1, 15))::BIGINT AS hv
      |  FROM (SELECT doc_id, source,
      |          unnest(string_split_regex(lower(text), '\s+')) AS w
      |        FROM documents) t),
      |c AS (SELECT doc_id, source, hv, COUNT(*) AS n
      |  FROM tok GROUP BY 1, 2, 3),
      |d AS (SELECT doc_id, source, SUM(n) AS n_toks,
      |    COUNT(*) AS n_distinct, MAX(n) AS top_n
      |  FROM c GROUP BY 1, 2)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_toks - n_distinct) AS BIGINT) AS total_dup_words,
      |  CAST(SUM(CASE WHEN 10000 * (n_toks - n_distinct) // n_toks
      |    >= 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_dupfrac,
      |  CAST(SUM(CASE WHEN 10000 * top_n // n_toks >= 1500
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_topshare
      |FROM d GROUP BY source ORDER BY source""".stripMargin) {
    (spark, dir) =>
    import spark.implicits._
    import graft.functions.TextFunctions.lowerTokens
    val tok = Tables.loadParallel(spark, dir, "documents")
      .select($"doc_id", $"source",
        explode_outer(graft.plans.Md5PrefixLongs(lowerTokens($"text")))
          .as("hv"))
      .filter($"hv".isNotNull)
    val d = tok
      .groupBy($"doc_id", $"source", $"hv")
      .agg(count(lit(1)).as("n"))
      .groupBy($"doc_id", $"source")
      .agg(sum($"n").as("n_toks"), count(lit(1)).as("n_distinct"),
        max($"n").as("top_n"))
    d.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_toks" - $"n_distinct").as("total_dup_words"),
        sum(when(expr("10000 * (n_toks - n_distinct) DIV n_toks")
          >= 5000, 1L).otherwise(0L)).as("n_flag_dupfrac"),
        sum(when(expr("10000 * top_n DIV n_toks") >= 1500, 1L)
          .otherwise(0L)).as("n_flag_topshare"))
      .orderBy($"source")
  }

  /** BPE pair statistics — the inner loop of byte-pair-encoding
    * induction: the corpus-wide frequency of every adjacent character
    * pair inside words, top 20 (count desc, pair asc — the merge the
    * tokenizer would pick next is row 1). The pair arrays are built
    * per row (filter → per-word transform → flatten) so ONE explode
    * feeds one hash aggregate; pairs are 2-char strings with heavy
    * map-side combine (the distinct-pair space is tiny relative to
    * the corpus), so the shuffle is bounded by partitions × |pairs|.
    */
  val q198_bpe_pairs: Q = Q(
    "q198_bpe_pairs",
    """WITH tok AS (SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
      |  FROM documents),
      |p AS (SELECT substr(w, CAST(i AS INT), 2) AS pair
      |  FROM (SELECT w, unnest(range(1, len(w))) AS i FROM tok) t)
      |SELECT pair, COUNT(*) AS n FROM p
      |GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin) {
    (spark, dir) =>
    import spark.implicits._
    import graft.functions.TextFunctions.lowerTokens
    val pairArr = flatten(transform(
      filter(lowerTokens($"text"), w => length(w) >= 2),
      w => transform(sequence(lit(1), length(w) - 1),
        i => w.substr(i, lit(2)))))
    Tables.loadParallel(spark, dir, "documents")
      .select(explode_outer(pairArr).as("pair"))
      .filter($"pair".isNotNull)
      .groupBy($"pair")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"pair")
      .limit(20)
  }

  /** Contrastive hard-negative mining: for each probe vector, the 5
    * highest-cosine candidates with a DIFFERENT label — the negatives
    * that most confuse a classifier, exactly what contrastive training
    * wants. Probes broadcast ([[Similarity.hardNegatives]]); the
    * oracle replays the brute force.
    */
  val q199_hard_negatives: Q = Q(
    "q199_hard_negatives",
    """WITH q AS (SELECT vec_id AS qid, label AS qlabel, embedding AS qe
      |  FROM embeddings WHERE vec_id < 10),
      |scored AS (SELECT qid, vec_id AS cid,
      |    list_reduce(list_transform(range(1, 65),
      |      i -> CAST(qe[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (x, y) -> x + y)
      |    / (sqrt(list_reduce(list_transform(range(1, 65),
      |        i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)), (x, y) -> x + y))
      |     * sqrt(list_reduce(list_transform(range(1, 65),
      |        i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (x, y) -> x + y)))
      |    AS cos
      |  FROM q, embeddings WHERE label != qlabel)
      |SELECT qid, CAST(rank AS INT) AS rank, cid, cos FROM (
      |  SELECT qid, cid, cos,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
      |  FROM scored) t
      |WHERE rank <= 5
      |ORDER BY qid, rank""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val emb = Tables.loadParallel(spark, dir, "embeddings")
    val probes = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"label".as("qlabel"),
        $"embedding".as("qvec"))
    val candidates = emb.select($"vec_id".as("cid"),
      $"label".as("clabel"), $"embedding".as("cvec"))
    Similarity.hardNegatives(broadcast(probes), candidates, 5)
      .select($"qid", $"rank".cast("int").as("rank"), $"cid", $"cos")
      .orderBy($"qid", $"rank")
  }

  val all: Seq[Q] = Seq(
    q197_repetition_rules, q198_bpe_pairs, q199_hard_negatives)
}
