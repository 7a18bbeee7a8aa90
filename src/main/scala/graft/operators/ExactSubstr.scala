package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Let, TextFunctions}

/** Minimal-length EXACT substring dedup across documents (the
  * "Deduplicating Training Data Makes Language Models Better"
  * operator, Lee et al. 2021 — their ExactSubstr with a length
  * threshold): find every maximal cross-document duplicated token run
  * of length ≥ `minTokens`, with EXACT boundaries, and optionally
  * strip the non-canonical copies. Where [[Dedup.removeDupSpans]]
  * removes ANY duplicated k-gram (fixed k-gram granularity — its unit
  * IS the threshold), this operator detects arbitrarily long shared
  * runs and applies the length cut the ExactSubstr recipe prescribes
  * (50 tokens there): short incidental n-gram collisions survive,
  * long verbatim quotations don't.
  *
  * Formulation — sorted k-gram ANCHOR EXTENSION, Spark-shaped (the
  * suffix-array step of the paper re-expressed as the matching-
  * diagonal scan [[Dedup.longestDupSpan]] established): a shared run
  * of length L ≥ k contains exactly L−k+1 k-gram matches at
  * consecutive positions in both docs — one diagonal
  * (pos_a − pos_b = const) of the match matrix. Runs come from the
  * classic rownumber-difference grouping per (pair, diagonal); the
  * length filter then keeps runs ≥ minTokens, and per-document
  * interval union merges overlapping marks from different partners.
  *
  * Canonicality: for every run the LOWER doc id keeps its copy; the
  * higher side is marked. Chains resolve naturally (a quotes b quotes
  * c ⇒ a survives, b and c lose their copies to interval union).
  * Within-doc repeats are OUT of scope here (doc_a < doc_b) —
  * [[Dedup.removeDupSpans]] owns that case at k-gram granularity.
  *
  * Scale shape: text is read ONCE into (doc, pos, 60-bit long) rows
  * ([[graft.plans.Md5PrefixLongs]] in the scan — text never
  * shuffles); the wide moves key on the shingle hash and on
  * (doc_a, doc_b, diag) — both well-spread; the interval merge is a
  * per-document window (bounded by the doc's own token count). Like
  * every shingle-bucketed dedup here the candidate cost is Σ_hash
  * df²; strip boilerplate first (q128) or cap df with `maxDf` on
  * corpora with ultra-hot k-grams.
  */
object ExactSubstr {

  /** Merged duplicated-span intervals per MARKED document: one row
    * per maximal union interval `(doc, start, len)` — `start` is the
    * 0-based token index, `len` ≥ `minTokens` tokens. A doc appears
    * iff some lower-id doc shares a run of ≥ `minTokens` tokens with
    * it.
    *
    * @param k         anchor unit in tokens (runs shorter than k are
    *                  invisible — the candidate guarantee)
    * @param minTokens report/strip threshold, ≥ k
    * @param maxDf     optional stop-gram cap: drop shingle hashes in
    *                  more than this many docs before pairing (None =
    *                  exact; capped runs can only shrink)
    */
  def dupSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minTokens: Int = 16, maxDf: Option[Long] = None)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minTokens >= k,
      s"minTokens ($minTokens) must be >= k ($k): runs shorter than " +
        "the anchor unit are never candidates")
    dupSpansOfOcc(capDf(occIndex(df, idCol, textCol, k), maxDf),
      k, minTokens)
  }

  /** [[dupSpans]] over a PREBUILT [[occIndex]] — the seam that lets a
    * pipeline computing several span passes over the same corpus
    * (q309 runs the standing corpus through both the batch gate and
    * the incremental probe) build the anchor index ONCE instead of
    * once per call. `dupSpans(df, …) == dupSpansOfOcc(occIndex(df, …),
    * …)` by construction (the former delegates here).
    */
  def dupSpansOfOcc(g: DataFrame, k: Int, minTokens: Int): DataFrame = {
    val matches = g.select(col("doc").as("doc_a"),
        col("pos").as("pos_a"), col("hv"))
      .join(g.select(col("doc").as("doc_b"), col("pos").as("pos_b"),
        col("hv")), Seq("hv"))
      .filter(col("doc_a") < col("doc_b"))
    mergeIntervals(markedRuns(matches, k, minTokens))
  }

  /** The incremental ARRIVAL pattern (the q286/q167 shape for exact
    * substrings): today's `delta` probed against the standing
    * `history` index — detected spans land on DELTA docs only, and
    * the history×history pair space is never touched (it was already
    * resolved the day history arrived). Candidates are
    * history⋈delta plus delta⋈delta; with every history id below
    * every delta id (the append-only contract, REQUIRED — checked on
    * the ids that actually collide), the output is IDENTICAL to
    * running [[dupSpans]] over history ∪ delta and keeping the delta
    * docs (property-pinned). History text is re-shingled but never
    * enters pair space against itself — at corpus scale the occ
    * index is the staged table a daily pipeline persists.
    */
  def incrementalDupSpans(history: DataFrame, delta: DataFrame,
      idCol: String, textCol: String, k: Int = 8, minTokens: Int = 16)
      : DataFrame = {
    require(minTokens >= k,
      s"minTokens ($minTokens) must be >= k ($k)")
    incrementalDupSpansOfOcc(occIndex(history, idCol, textCol, k),
      occIndex(delta, idCol, textCol, k), k, minTokens)
  }

  /** [[incrementalDupSpans]] over PREBUILT [[occIndex]]es for both
    * sides — same seam as [[dupSpansOfOcc]]: at corpus scale the
    * history occ index is the staged table a daily pipeline persists,
    * so a caller that also runs the batch gate over history shares
    * ONE index build between the two (q309's shape). Delegation makes
    * the equality `incrementalDupSpans(h, d, …) ==
    * incrementalDupSpansOfOcc(occIndex(h…), occIndex(d…), …)` hold by
    * construction.
    */
  def incrementalDupSpansOfOcc(gh: DataFrame, gd: DataFrame,
      k: Int, minTokens: Int): DataFrame = {
    val dSide = gd.select(col("doc").as("doc_b"),
      col("pos").as("pos_b"), col("hv"))
    // history → delta: history is always the canonical (lower-id)
    // side; the assert makes the append-only contract loud instead of
    // silently mis-marking (a history id above a delta id would have
    // been the marked side in the full formulation)
    val hMatches = gh.select(col("doc").as("doc_a"),
        col("pos").as("pos_a"), col("hv"))
      .join(dSide, Seq("hv"))
      .select(assert_true(col("doc_a") < col("doc_b"),
        lit("incrementalDupSpans: history ids must all be below " +
          "delta ids")).as("_ok"),
        col("doc_a"), col("doc_b"), col("pos_a"), col("pos_b"))
      .filter(col("_ok").isNull) // assert_true yields NULL on pass
      .drop("_ok")
    val dMatches = gd.select(col("doc").as("doc_a"),
        col("pos").as("pos_a"), col("hv"))
      .join(dSide, Seq("hv"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("pos_a"), col("pos_b"))
    mergeIntervals(
      markedRuns(hMatches.unionByName(dMatches), k, minTokens))
  }

  /** (doc, pos, 60-bit hash) anchor index — text leaves the plan
    * here; checkpointed because every caller joins it at least twice.
    * Public as the shared-build seam for [[dupSpansOfOcc]] /
    * [[incrementalDupSpansOfOcc]].
    */
  def occIndex(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    df.select(col(idCol).as("doc"),
        posexplode_outer(
          graft.plans.Md5PrefixLongs(
            TextFunctions.positionalShingles(col(textCol), k)))
          .as(Seq("pos", "hv")))
      .filter(col("hv").isNotNull)
      .localCheckpoint()

  private def capDf(g0: DataFrame, maxDf: Option[Long]): DataFrame =
    maxDf match {
      case Some(cap) =>
        val rare = g0.groupBy(col("hv"))
          .agg(countDistinct(col("doc")).as("_df"))
          .filter(col("_df") <= cap)
          .select(col("hv"))
        g0.join(rare, Seq("hv"), "left_semi")
      case None => g0
    }

  /** Maximal diagonal runs ≥ minTokens from (doc_a, doc_b, pos_a,
    * pos_b) anchor matches; the HIGHER doc id is the marked side.
    * Distinct because different partners/diagonals can mark identical
    * intervals.
    */
  private def markedRuns(matches: DataFrame, k: Int, minTokens: Int)
      : DataFrame = {
    val m = matches.select(col("doc_a"), col("doc_b"), col("pos_b"),
      (col("pos_a") - col("pos_b")).as("diag"))
    val wRun = Window.partitionBy(col("doc_a"), col("doc_b"),
      col("diag")).orderBy(col("pos_b"))
    m.withColumn("grp", col("pos_b") - row_number().over(wRun))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("grp"))
      .agg(min(col("pos_b")).as("start"),
        (count(lit(1)) + lit(k - 1)).cast("long").as("len"))
      .filter(col("len") >= minTokens)
      .select(col("doc_b").as("doc"), col("start").cast("long"),
        col("len"))
      .distinct()
  }

  /** Interval union per doc (gaps-and-islands): input
    * `(doc, start, len)`, output the same schema with overlapping/
    * touching intervals coalesced. Per-doc window only — bounded by
    * the doc's own span count.
    */
  private def mergeIntervals(spans: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc"))
      .orderBy(col("start"), col("e"))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    spans
      .withColumn("e", col("start") + col("len"))
      .withColumn("_maxe", max(col("e")).over(wPrev))
      .withColumn("_new",
        when(col("_maxe").isNull || col("start") > col("_maxe"), 1L)
          .otherwise(0L))
      .withColumn("_isl", sum(col("_new")).over(w))
      .groupBy(col("doc"), col("_isl"))
      .agg(min(col("start")).as("start"),
        (max(col("e")) - min(col("start"))).as("len"))
      .select(col("doc"), col("start"), col("len"))
  }

  /** Strip the marked copies: every token of a doc covered by a
    * ≥ `minTokens` run already present in a lower-id doc is dropped,
    * and the doc re-joined from survivors — the transform
    * counterpart of [[dupSpans]], same reconstruct discipline as
    * [[Dedup.removeDupSpans]] (marks move as (doc, int, int) rows;
    * text rides only the final doc-keyed join).
    *
    * @return one row per input doc: `idCol, clean_text, n_tokens,
    *         n_removed` (n_tokens = original count).
    */
  def strip(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minTokens: Int = 16, maxDf: Option[Long] = None)
      : DataFrame = {
    val marks = dupSpans(df, idCol, textCol, k, minTokens, maxDf)
      .groupBy(col("doc"))
      .agg(collect_list(struct(col("start"), col("len"))).as("_spans"))
    df.select(col(idCol).as("doc"), col(textCol).as("_text"))
      .join(marks, Seq("doc"), "left")
      .select(col("doc").as(idCol),
        Let(TextFunctions.lowerTokens(col("_text")),
            coalesce(col("_spans"),
              array().cast("array<struct<start:bigint,len:bigint>>"))) {
          (toks, spans) =>
            Let(transform(
                filter(sequence(lit(0), size(toks) - 1),
                  i => !exists(spans, s =>
                    i.cast("long") >= s.getField("start") &&
                      i.cast("long") <
                        s.getField("start") + s.getField("len"))),
                i => element_at(toks, i + 1))) { kept =>
              struct(
                array_join(kept, " ").as("clean_text"),
                size(toks).cast("long").as("n_tokens"),
                (size(toks) - size(kept)).cast("long").as("n_removed"))
            }
        }.as("_o"))
      .select(col(idCol), col("_o.clean_text"), col("_o.n_tokens"),
        col("_o.n_removed"))
  }
}
