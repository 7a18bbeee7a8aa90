package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables

/** Candidate-inflation guard for the PPJoin-style threshold join: the
  * candidate stage (prefix-token equi-join + length band + positional
  * filter) is the real cost driver at scale — the verify stage only
  * touches what this stage emits. Pin its row count on the fixed
  * sf0.001 documents corpus so a future edit that weakens the pruning
  * (or reverts the positional filter) fails here instead of silently
  * re-inflating q157.
  */
class ThresholdJoinGuardSpec extends SparkSpec {

  test("candidate stage stays far below all-pairs and near the " +
    "verified pair count on the documents corpus") {
    val docs = Tables.load(spark, sfDir, "documents")
    val (_, cand) = Dedup.thresholdJoinStages(docs, "text", "doc_id", 7000)
    val nDocs = docs.count()
    val allPairs = nDocs * (nDocs - 1) / 2
    val nCand = cand.count()
    val nPairs = Dedup.thresholdJoin(docs, "text", "doc_id", 7000).count()
    info(s"docs=$nDocs allPairs=$allPairs candidates=$nCand " +
      s"verified=$nPairs")
    assert(nPairs > 0, "fixture must contain planted near-dups")
    assert(nCand >= nPairs, "candidates must be a superset")
    // pre-positional-filter the candidate stage ran at ~400x the
    // verified pair count (round-4 q157 profile); with it, this corpus
    // measures candidates == verified (28/28). Allow headroom but fail
    // on any return to all-pairs-like inflation.
    assert(nCand <= allPairs / 10,
      s"candidate stage degenerating toward all-pairs: $nCand of $allPairs")
    assert(nCand <= nPairs * 50,
      s"candidate inflation regressed: $nCand candidates for $nPairs pairs")
  }
}
