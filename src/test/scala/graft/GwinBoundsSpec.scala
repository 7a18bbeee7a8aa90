package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.{WindowExecBase,
  WindowGroupLimitExec}

/** EXECUTABLE bounds for the partition-less-window allowlist — the r9
  * verdict's "prose, not proof" gap. `tools/drift_check.py`'s
  * GWIN_ALLOWLIST said WHY each global window's input is bounded
  * ("20-row strata", "24 clock-hour rollup") but nothing enforced it;
  * one refactor could sneak an unbounded global window back in under
  * an allowlisted name.
  *
  * This spec executes, for EVERY allowlisted query, the exact physical
  * subplan feeding each partition-less WindowExec /
  * WindowGroupLimitExec and asserts its row count is under the
  * documented bound. The bounds are SF-independent by construction
  * (constant-key filters, post-limit positions, calendar/stratum
  * rollups), so they are asserted at BOTH sf0.001 and sf0.01 — a bound
  * that secretly scales with the corpus fails the larger SF.
  *
  * drift_check.py cross-references this file: every GWIN_ALLOWLIST
  * entry must appear here with a numeric bound, so deleting a row from
  * this spec (or renaming the query) fails preflight, not just review.
  */
class GwinBoundsSpec extends SparkSpec {

  /** query -> (max rows into any of its partition-less windows, why
    * that bound is structural). Keep keys in lockstep with
    * tools/drift_check.py GWIN_ALLOWLIST (drift_check enforces it).
    */
  private val bounds: Map[String, (Long, String)] = Map(
    "q107_null_ordering" -> ((350L,
      "customer filtered to c_custkey <= 300 before the sort/window")),
    "q112_vocab_encode" -> ((100L,
      "the rank window runs AFTER .limit(100)")),
    "q194_temperature_mix" -> ((64L,
      "apportionment over one row per language")),
    "q209_seasonality" -> ((48L, "24 clock-hour rollup rows")),
    "q214_changepoint" -> ((512L, "per-day rollup, calendar-bounded")),
    "q23_frames" -> ((2600L,
      "per-day rollup over o_orderdate: the TPC-H order calendar is " +
        "1992-01-01..1998-08-02 = 2406 distinct days at ANY corpus " +
        "size")),
    "q275_doremi_mix" -> ((64L,
      "largest-remainder over the 20-row strata table")),
    "q282_interleave_schedule" -> ((64L,
      "apportionment/schedule windows over one row per source")))

  /** The subplans feeding each partition-less window of `df`'s FINAL
    * physical plan, executed to an exact row count. The query runs to
    * completion first so AQE finalizes every stage — final-plan
    * fragments carry their columnar transitions and materialized
    * shuffle stages, so re-executing just the window-feeding subtree
    * is cheap (it replays from the materialized exchange) and measures
    * precisely what the window ingests — not the query input, not its
    * output. (initialPlan fragments are NOT directly executable: they
    * lack the ColumnarToRow transitions the preparation rules insert.)
    */
  private def gwinInputCounts(df: DataFrame): Seq[Long] = {
    // drive THIS QueryExecution to completion (a .write would build a
    // separate one and leave this adaptive plan un-finalized)
    df.queryExecution.toRdd.count()
    val children = scala.collection.mutable.ArrayBuffer.empty[SparkPlan]
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      // materialized stages are LEAF nodes — descend into their plans
      // or every window below the last stage boundary goes unseen
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(s.plan)
      case other =>
        other match {
          case w: WindowExecBase if w.partitionSpec.isEmpty =>
            children ++= w.children
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
            children += w.child
          case _ => ()
        }
        other.children.foreach(walk)
        other.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    children.toSeq.map(_.execute().count())
  }

  // EAGER global windows — executed during query CONSTRUCTION (inside
  // a localCheckpoint), so they never appear in the final plan the
  // ledger counts (gwin=0) yet still take Spark's single-partition
  // path at runtime (found round 11 via q239's bench warnings). Their
  // boundedness is asserted here on the exact input the eager window
  // ingests; Gwin.EagerGwinAllowed mutes exactly these labels.
  test("q239_stratified_sample's EAGER apportionment windows " +
    "(allocateLargestRemainder under alloc.localCheckpoint) ingest " +
    "one row per source — bounded at any corpus size") {
    import org.apache.spark.sql.functions.{count, lit}
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach {
      dir =>
        // the stratum table IS the window input: documents grouped by
        // source (the exact DataFrame q239 hands to the apportioner)
        val strata = graft.core.Tables
          .loadParallel(spark, dir, "documents")
          .groupBy(org.apache.spark.sql.functions.col("source"))
          .agg(count(lit(1)).as("n_docs"))
        val n = strata.count()
        // the synthetic corpus has 20 sources (src0..src19) at every
        // SF; 32 leaves headroom without admitting a corpus-scaling
        // input
        assert(n > 0 && n <= 32L,
          s"q239's stratum table has $n rows at $dir — the eager " +
            "window's one-row-per-source bound no longer holds")
    }
  }

  for ((name, (bound, why)) <- bounds.toSeq.sortBy(_._1)) {
    test(s"$name: every partition-less window ingests <= $bound rows " +
      s"($why), at sf0.001 and sf0.01") {
      val run = SparkEntry.queries.getOrElse(name,
        fail(s"$name is gwin-allowlisted but not in SparkEntry.queries"))
      Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach {
        dir =>
          val counts = gwinInputCounts(run(spark, dir))
          assert(counts.nonEmpty,
            s"$name plans NO partition-less window at $dir — stale " +
              "allowlist entry: remove it from GwinBoundsSpec AND " +
              "tools/drift_check.py GWIN_ALLOWLIST")
          counts.foreach(c => assert(c <= bound,
            s"$name at $dir: a partition-less window ingests $c rows " +
              s"> documented bound $bound — the boundedness argument " +
              "no longer holds; rewrite via PrefixSum.withOrdinals"))
      }
    }
  }
}
