package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for algebraic aggregates.
  *
  * COUNT / SUM / MIN / MAX partials are mergeable: combining the
  * per-period partial-aggregate tables is equivalent to aggregating
  * the union of their raw inputs. That equivalence is the whole scale
  * story — a 100 TB history is aggregated ONCE into a compact partial
  * table, and each new batch only aggregates its own delta and merges
  * key-by-key (one shuffle over partial-table cardinality, not a
  * rescan of history). The reference maintains its cumulated tables
  * with exactly this discipline (upsert into aggregate tables,
  * `assignmnet_2.sql:128-137`); this operator is the generic form.
  *
  * Non-algebraic aggregates (MEDIAN, exact COUNT DISTINCT) do NOT
  * merge this way — they need either the raw data or a mergeable
  * sketch (see q9/q66/q87 for the sketch route).
  */
object IncrementalAgg {

  /** Merge two partial-aggregate tables keyed by `keys`.
    *
    * A key present on one side only passes through unchanged (the
    * null-safe merge expressions need no typed zero: `coalesce(b+d,
    * b, d)` adds when both sides exist and falls back to whichever is
    * present).
    *
    * @param sumCols columns merged by addition (COUNT and SUM
    *                partials — works for integral and decimal types)
    * @param maxCols columns merged by `greatest` (MAX partials)
    * @param minCols columns merged by `least` (MIN partials)
    */
  def mergePartials(base: DataFrame, delta: DataFrame, keys: Seq[String],
      sumCols: Seq[String], maxCols: Seq[String] = Nil,
      minCols: Seq[String] = Nil): DataFrame = {
    val valueCols = sumCols ++ maxCols ++ minCols
    val d = delta.select(
      (keys.map(col) ++ valueCols.map(c => col(c).as(s"_d_$c"))): _*)
    val merged =
      sumCols.map(c =>
        coalesce(col(c) + col(s"_d_$c"), col(c), col(s"_d_$c")).as(c)) ++
        maxCols.map(c => greatest(col(c), col(s"_d_$c")).as(c)) ++
        minCols.map(c => least(col(c), col(s"_d_$c")).as(c))
    base.join(d, keys, "full_outer")
      .select(keys.map(col) ++ merged: _*)
  }

  /** Merge partial-aggregate tables that carry HLL sketch columns
    * (`hll_sketch_agg` binaries) — the mergeable-state route for
    * COUNT DISTINCT, which has no algebraic partial. Each batch
    * sketches only its delta; the union is a few KB per key
    * regardless of how many distinct values history holds, and
    * `hll_sketch_estimate` reads the maintained table without ever
    * rescanning raw data. Same key semantics as [[mergePartials]]
    * (one-sided keys pass through).
    */
  def mergeSketches(base: DataFrame, delta: DataFrame, keys: Seq[String],
      sketchCols: Seq[String]): DataFrame = {
    val d = delta.select(
      (keys.map(col) ++ sketchCols.map(c => col(c).as(s"_d_$c"))): _*)
    // when-chain, not coalesce(hll_union(...), …): branches evaluate
    // lazily, so a one-sided key never feeds NULL into hll_union
    val merged = sketchCols.map(c =>
      when(col(c).isNull, col(s"_d_$c"))
        .when(col(s"_d_$c").isNull, col(c))
        .otherwise(hll_union(col(c), col(s"_d_$c")))
        .as(c))
    base.join(d, keys, "full_outer")
      .select(keys.map(col) ++ merged: _*)
  }

  /** Retract a batch of deleted rows from a maintained
    * partial-aggregate table — the CDC-delete counterpart of
    * [[mergePartials]]. Only SUM/COUNT partials retract algebraically
    * (subtract the delta's partials); MIN/MAX have no inverse — a
    * deleted row that WAS the extremum needs a per-key recompute from
    * raw history, so this operator refuses those columns by design
    * (maintain extremes with [[Upsert.applyChangelog]] snapshots or a
    * keyed recompute instead).
    *
    * Contract guards, both loud and in-plan (no driver scan):
    *  - a retraction for a key the base does not hold, or one that
    *    drives `countCol` negative, raises — it means the delta was
    *    not a subset of history (double-delete, replayed batch);
    *  - keys whose count reaches zero are DROPPED, so
    *    retract(merge(p(A), p(B)), p(B)) round-trips to exactly p(A)
    *    (property-proven in IncrementalAggProps).
    *
    * @param countCol the COUNT partial among `sumCols` that defines
    *                 key liveness (drop at zero, negative = error)
    */
  def retractPartials(base: DataFrame, deleted: DataFrame,
      keys: Seq[String], sumCols: Seq[String], countCol: String)
      : DataFrame = {
    require(sumCols.contains(countCol),
      s"countCol $countCol must be one of sumCols $sumCols")
    val d = deleted.select(
      (keys.map(col) ++ sumCols.map(c => col(c).as(s"_d_$c"))): _*)
    val merged = sumCols.map { c =>
      val out = coalesce(col(c) - col(s"_d_$c"), col(c)).as(c)
      if (c == countCol)
        when(col(s"_d_$c").isNotNull && col(c).isNull,
          raise_error(concat(lit("retraction for absent key: "),
            concat_ws(",", keys.map(col): _*))))
          .when(col(c) - col(s"_d_$c") < 0,
            raise_error(concat(lit("retraction below zero for key: "),
              concat_ws(",", keys.map(col): _*))))
          .otherwise(out)
          .as(c)
      else out
    }
    base.join(d, keys, "full_outer")
      .select(keys.map(col) ++ merged: _*)
      .filter(col(countCol) > 0)
  }

  /** CDC-delete retraction INCLUDING MIN/MAX partials — the keyed-
    * recompute companion to [[retractPartials]] (which refuses
    * extremes because they have no algebraic inverse).
    *
    * SUM/COUNT columns retract by subtraction exactly as in
    * [[retractPartials]]. For MIN/MAX the operator re-derives the
    * extremum from raw history, but ONLY for the keys the delete
    * batch touches: `remaining` (the post-delete raw rows) is
    * left-semi-joined against the delete batch's key set — an
    * explicitly broadcast dimension, so at 100 TB the recompute is a
    * map-side filter on the history scan (runtime-filter/DPP-able on
    * partitioned storage) followed by an aggregation over ONLY the
    * touched keys' rows. Untouched keys never leave the maintained
    * table: their extremes pass through column-identically, with no
    * rescan and no per-key state.
    *
    * Contract guards, loud and in-plan like [[retractPartials]]:
    * absent-key and negative-count retractions raise, and so does a
    * deleted extremum that EXCEEDS the maintained one (`_d_max > max`
    * or `_d_min < min` — impossible when the delete batch is a true
    * subset of history, so it means a replayed or corrupted batch).
    * Keys whose count reaches zero are dropped.
    *
    * @param base      maintained partials: keys ++ sumCols ++ maxCols
    *                  ++ minCols
    * @param deleted   the delete batch's OWN partials, same shape
    * @param remaining raw post-delete history; must carry `keys` and,
    *                  for each extreme column c, a raw column named c
    *                  (a row is a group of size one)
    */
  def retractWithRecompute(base: DataFrame, deleted: DataFrame,
      remaining: DataFrame, keys: Seq[String], sumCols: Seq[String],
      countCol: String, maxCols: Seq[String] = Nil,
      minCols: Seq[String] = Nil): DataFrame = {
    require(sumCols.contains(countCol),
      s"countCol $countCol must be one of sumCols $sumCols")
    val extremeCols = maxCols ++ minCols
    val valueCols = sumCols ++ extremeCols
    val d = deleted.select(
      (keys.map(col) ++ valueCols.map(c => col(c).as(s"_d_$c"))): _*)
    // fresh extremes for touched keys only — the delete batch's key
    // set is the (small) driver of the recompute, broadcast into the
    // history scan
    require(extremeCols.nonEmpty,
      "no extreme columns — use retractPartials for pure SUM/COUNT")
    val recAggs = maxCols.map(c => max(col(c)).as(s"_r_$c")) ++
      minCols.map(c => min(col(c)).as(s"_r_$c"))
    val rec = remaining
      .join(broadcast(d.select(keys.map(col): _*)), keys, "left_semi")
      .groupBy(keys.map(col): _*)
      .agg(recAggs.head, recAggs.tail: _*)
    val touched = col(s"_d_$countCol").isNotNull
    val keyStr = concat_ws(",", keys.map(col): _*)
    val merged = sumCols.map { c =>
      val out = coalesce(col(c) - col(s"_d_$c"), col(c)).as(c)
      if (c == countCol)
        when(touched && col(c).isNull,
          raise_error(concat(lit("retraction for absent key: "), keyStr)))
          .when(col(c) - col(s"_d_$c") < 0,
            raise_error(concat(
              lit("retraction below zero for key: "), keyStr)))
          .otherwise(out)
          .as(c)
      else out
    } ++ maxCols.map { c =>
      when(col(s"_d_$c") > col(c),
        raise_error(concat(
          lit(s"deleted $c above maintained max for key: "), keyStr)))
        .when(touched, col(s"_r_$c"))
        .otherwise(col(c))
        .as(c)
    } ++ minCols.map { c =>
      when(col(s"_d_$c") < col(c),
        raise_error(concat(
          lit(s"deleted $c below maintained min for key: "), keyStr)))
        .when(touched, col(s"_r_$c"))
        .otherwise(col(c))
        .as(c)
    }
    base.join(d, keys, "full_outer")
      .join(broadcast(rec), keys, "left_outer")
      .select(keys.map(col) ++ merged: _*)
      .filter(col(countCol) > 0)
  }

  /** Incremental maintenance of an INNER equi-join view under
    * append-only deltas — the join counterpart of [[mergePartials]]'
    * aggregate maintenance.
    *
    * With A = A_old ∪ ΔA and B = B_old ∪ ΔB (multiset, append-only —
    * updates/deletes need a changelog operator, see
    * [[Upsert.applyChangelog]]), the new view decomposes into three
    * DISJOINT match categories:
    *
    *   A ⋈ B = (A_old ⋈ B_old) ∪ (ΔA ⋈ B) ∪ (A_old ⋈ ΔB)
    *         =  V_old           ∪ ΔV
    *
    * so a 100 TB maintained view is never re-joined: each batch
    * computes only the delta terms, in which ONE side is always the
    * (small) delta. With `broadcastDeltas` (default) the delta side
    * carries an explicit broadcast hint — the maintained-side scan
    * streams map-side through both delta joins with no shuffle at
    * all; disable it when deltas can exceed broadcast size and let
    * stats decide. Property-proven multiset-equal to the full re-join
    * in IncrementalAggProps (keys missing on one side, duplicate
    * keys, empty deltas).
    */
  def joinDelta(
      view: DataFrame,
      aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame,
      keys: Seq[String],
      broadcastDeltas: Boolean = true): DataFrame = {
    def bc(df: DataFrame): DataFrame =
      if (broadcastDeltas) broadcast(df) else df
    val bNew = bOld.unionByName(bDelta)
    view
      .unionByName(bc(aDelta).join(bNew, keys))
      .unionByName(aOld.join(bc(bDelta), keys))
  }

  /** Retract CDC-deleted source rows from a maintained INNER-join view
    * — the delete counterpart of [[joinDelta]], closing the join-IVM
    * family the way [[retractPartials]]/[[retractWithRecompute]] close
    * the aggregate one.
    *
    * The naive identity V_new = V − ΔA⋈B − A⋈ΔB + ΔA⋈ΔB needs
    * multiset EXCEPT over the full view — a 100 TB shuffle per delete
    * batch. The production design is LINEAGE: every view row carries
    * its contributing source-row ids (`aRid`, `bRid` — primary keys or
    * synthesized ingest ids, written once at view build/append time by
    * [[joinDelta]]'s projections), and retraction becomes two
    * broadcast anti-joins on those ids — the maintained view streams
    * map-side past the (small) delete batches, with no shuffle and no
    * recompute of surviving matches. A view row dies exactly when
    * EITHER parent row dies, which is precisely inner-join semantics;
    * duplicate source rows need distinct rids (lineage ids, not value
    * keys) or a delete takes all duplicates with it.
    *
    * Property-proven ≡ (A − ΔA) ⋈ (B − ΔB) re-joined from scratch
    * (IncrementalAggProps), including deletes hitting multi-match
    * keys and rows absent from the view.
    */
  def joinRetract(
      view: DataFrame,
      aDeleted: DataFrame, aRid: String,
      bDeleted: DataFrame, bRid: String): DataFrame =
    view
      .join(broadcast(aDeleted.select(col(aRid))), Seq(aRid), "left_anti")
      .join(broadcast(bDeleted.select(col(bRid))), Seq(bRid), "left_anti")
}
