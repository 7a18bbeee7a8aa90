package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Graph}
import graft.functions.TextFunctions.datasetSplit

/** The leakage-safe split (q228) versus the per-doc split (q58) on a
  * corpus of known duplicate pairs: bucketing each doc independently
  * MUST put at least one duplicate pair on different sides (the
  * contamination bug), while bucketing by the near-dup component
  * representative can never split a group — checked per component,
  * not just asserted from construction.
  */
class LeakageSplitSpec extends SparkSpec {
  import spark.implicits._

  test("group-keyed split never straddles a near-dup group; " +
      "per-doc split does") {
    val docs = (0 until 60).flatMap { i =>
      val text = s"alpha bravo charlie delta echo pair$i " +
        s"foxtrot golf hotel india juliet kilo"
      Seq((i.toLong, text), ((1000 + i).toLong, text))
    }.toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(docs, "text", "doc_id",
        maxDist = 3, bands = 4)
      .select($"id_a".as("u"), $"id_b".as("v"))
    val cc = Graph.connectedComponents(pairs)
      .withColumnRenamed("id", "doc_id")
    val assigned = docs
      .join(broadcast(cc), Seq("doc_id"), "left_outer")
      .select($"doc_id", $"comp",
        datasetSplit(coalesce($"comp", $"doc_id")).as("split_safe"),
        datasetSplit($"doc_id").as("split_naive"))
    // identical texts -> identical simhash -> every (i, 1000+i) pair
    // is grouped; sanity-check that before testing the property
    val grouped = assigned.filter($"comp".isNotNull).count()
    assert(grouped == 120L, s"expected all 120 docs grouped, $grouped")
    val perGroup = assigned.filter($"comp".isNotNull)
      .groupBy($"comp")
      .agg(countDistinct($"split_safe").as("n_safe"),
        countDistinct($"split_naive").as("n_naive"))
    assert(perGroup.filter($"n_safe" > 1).count() == 0,
      "a near-dup group straddled splits under the group-keyed bucket")
    assert(perGroup.filter($"n_naive" > 1).count() > 0,
      "fixture too weak: per-doc bucketing straddled no group, so " +
        "the test proves nothing — widen the corpus")
  }
}
