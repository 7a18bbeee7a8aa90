package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked-retrieval evaluation — the measurement side of the ANN /
  * retrieval stack ([[Similarity]], q47/q63/q159): given a ranked
  * candidate list per query and a relevance oracle, score the ranking
  * (nDCG@k, MRR, recall@k) and fuse rankings from different retrievers
  * (reciprocal-rank fusion). Reference frames retrieval as plain
  * ranked SELECTs (e.g. `3-spark-fundamentals` homework's ordered
  * top-N); the eval layer is the training-data extension: you cannot
  * tune a retriever, a dedup threshold, or an ANN recall/latency
  * trade-off without these numbers.
  *
  * Exactness discipline (the [[RankEval]] rules):
  *  - nDCG's per-rank discount 1/log₂(r+1) is irrational, so both
  *    engines use the SAME pre-quantized integer micro-weight table
  *    `w(r) = round(10⁶ / log₂(r+1))` ([[ndcgWeightsMicro]] — the
  *    Scala array is the single source of truth; the oracle SQL embeds
  *    its values as literals). DCG/IDCG are then exact integer sums
  *    and `ndcg_bp = 10⁴·dcg div idcg` is exact — both engines agree
  *    to the bit, and the quantization error vs the real-valued nDCG
  *    is below 10⁻⁶ per rank, far inside any decision margin.
  *  - MRR's 1/rank is rational: `mrr_micro = 10⁶ div first_rel_rank`
  *    is exact. recall@k is rational: `recall_bp = 10⁴·hits div
  *    n_rel`. RRF's 1/(k₀+r) is rational: contributions are
  *    `10⁹ div (k₀+rank)` — integer, exact, and large enough that no
  *    two distinct (rank-set) sums collide within k ≤ 100.
  *
  * Scale shape: everything is one `groupBy(qid)` over the ranked
  * lists — rows = queries × k, never corpus-sized; the weight table
  * rides along as an array literal (`element_at`), not a join. RRF is
  * a union + one keyed aggregate + the per-query top-k window. No
  * collect anywhere.
  */
object RetrievalEval {

  /** Integer micro-gain table for nDCG: w(r) = round(10⁶/log₂(r+1)),
    * r = 1..k. w(1) = 10⁶, decreasing. Single source of truth for
    * engine AND oracle (embed these values as SQL literals).
    */
  def ndcgWeightsMicro(k: Int): IndexedSeq[Long] =
    // StrictMath, not math: java.lang.Math.log is allowed a 1-ulp
    // platform/JIT variance; a round() landing near a .5 boundary
    // could then differ across JVMs and break the bit-identical
    // cross-engine weight table. StrictMath is fdlibm-pinned.
    (1 to k).map(r => math.round(
      1e6 / (StrictMath.log(r + 1.0) / StrictMath.log(2.0))))

  /** Prefix sums of [[ndcgWeightsMicro]]: ideal DCG for n_rel = 1..k
    * relevant items (IDCG(m) = Σ_{r≤min(m,k)} w(r)).
    */
  def idcgPrefixMicro(k: Int): IndexedSeq[Long] =
    ndcgWeightsMicro(k).scanLeft(0L)(_ + _).tail

  /** Score a ranked run against binary relevance.
    *
    * @param ranked (qid, rank, rel) — rank 1-based within qid, rel 0/1.
    *               Ranks beyond k are ignored (filtered here).
    * @param nRel   (qid, n_rel) — TOTAL relevant candidates per query
    *               (the recall denominator and the IDCG depth; corpus-
    *               wide, not just retrieved).
    * @return one row per query in nRel: `qid, n_rel, hits, dcg_micro,
    *         idcg_micro, ndcg_bp, mrr_micro, recall_bp`. Queries with
    *         no retrieved relevant item score 0 across the board.
    */
  def rankMetrics(ranked: DataFrame, nRel: DataFrame, k: Int)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = ndcgWeightsMicro(k)
    val pref = idcgPrefixMicro(k)
    val perQ = ranked
      .filter(col("rank") <= k)
      .groupBy(col("qid"))
      .agg(
        sum(when(col("rel") === 1,
          element_at(lit(w.toArray), col("rank").cast("int")))
          .otherwise(0L)).as("dcg_micro"),
        sum(when(col("rel") === 1, 1L).otherwise(0L)).as("hits"),
        min(when(col("rel") === 1, col("rank"))).as("_first_rel"))
    // left join FROM nRel: a query whose run retrieved nothing at all
    // still reports a (zeroed) row
    nRel
      .join(perQ, Seq("qid"), "left")
      .select(
        col("qid"),
        col("n_rel").cast("long").as("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        coalesce(col("dcg_micro"), lit(0L)).as("dcg_micro"),
        when(col("n_rel") <= 0, 0L)
          .otherwise(element_at(lit(pref.toArray),
            least(col("n_rel"), lit(k)).cast("int"))).as("idcg_micro"),
        col("_first_rel"))
      .withColumn("ndcg_bp",
        when(col("idcg_micro") <= 0, 0L)
          .otherwise(expr("(10000 * dcg_micro) DIV idcg_micro")))
      .withColumn("mrr_micro",
        when(col("_first_rel").isNull, 0L)
          .otherwise(expr("1000000 DIV _first_rel")))
      .withColumn("recall_bp",
        when(col("n_rel") <= 0, 0L)
          .otherwise(expr("(10000 * hits) DIV n_rel")))
      .drop("_first_rel")
  }

  /** Reciprocal-rank fusion: each input ranking contributes
    * `10⁹ div (k0 + rank)` per (qid, cid); candidates are re-ranked by
    * the summed score (ties → more lists, then lower cid — a candidate
    * on BOTH lists beats a same-score singleton).
    *
    * @param rankings each (qid, cid, rank), rank 1-based per qid
    * @param k0       the RRF smoothing constant (classically 60)
    * @param topK     fused list depth to keep per query
    * @return (qid, rank, cid, rrf_micro, n_lists) — `rrf_micro` is the
    *         exact integer fused score, `n_lists` how many input
    *         rankings carried the candidate.
    */
  def rrfFuse(rankings: Seq[DataFrame], k0: Int, topK: Int)
      : DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k0 >= 0, s"k0 must be >= 0, got $k0")
    val unioned = rankings
      .map(_.select(col("qid"), col("cid"), col("rank")))
      .reduce(_ unionByName _)
    val fused = unioned
      .groupBy(col("qid"), col("cid"))
      .agg(
        sum(expr(s"1000000000 DIV ($k0 + rank)")).as("rrf_micro"),
        count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf_micro").desc, col("n_lists").desc, col("cid"))
    fused
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("rank"), col("cid"), col("rrf_micro"),
        col("n_lists"))
  }
}
