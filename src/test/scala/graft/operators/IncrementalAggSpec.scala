package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Merge of partial aggregates ≡ aggregate of the raw union. */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def partials(rows: Seq[(String, Long)]) =
    rows.toDF("k", "x").groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"x").as("s"),
        max($"x").as("mx"), min($"x").as("mn"))

  test("merge equals recompute, including one-sided keys") {
    val baseRows = Seq(("a", 1L), ("a", 5L), ("b", 2L))
    val deltaRows = Seq(("a", -3L), ("c", 7L)) // c: delta-only key
    val merged = IncrementalAgg.mergePartials(
        partials(baseRows), partials(deltaRows), Seq("k"),
        sumCols = Seq("n", "s"), maxCols = Seq("mx"), minCols = Seq("mn"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val recomputed = partials(baseRows ++ deltaRows)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(merged == recomputed)
    assert(merged.map(_._1) == Set("a", "b", "c"))
  }

  test("sketch merge estimates equal the full-data distinct count") {
    // small cardinalities: HLL stays in exact (list/set) mode, so the
    // merged estimate must equal both the direct sketch estimate and
    // the true distinct count
    val baseRows = Seq(("a", 1L), ("a", 2L), ("b", 10L))
    val deltaRows = Seq(("a", 2L), ("a", 3L), ("c", 5L))
    def sk(rows: Seq[(String, Long)]) =
      rows.toDF("k", "x").groupBy($"k")
        .agg(hll_sketch_agg($"x").as("users"))
    val merged = IncrementalAgg.mergeSketches(
        sk(baseRows), sk(deltaRows), Seq("k"), Seq("users"))
      .select($"k", hll_sketch_estimate($"users").as("est"))
      .as[(String, Long)].collect().toMap
    assert(merged == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
    val direct = sk(baseRows ++ deltaRows)
      .select($"k", hll_sketch_estimate($"users"))
      .as[(String, Long)].collect().toMap
    assert(merged == direct)
  }

  test("empty delta is an identity merge") {
    val base = partials(Seq(("a", 1L), ("b", 2L)))
    val merged = IncrementalAgg.mergePartials(
        base, partials(Seq.empty[(String, Long)]), Seq("k"),
        sumCols = Seq("n", "s"), maxCols = Seq("mx"), minCols = Seq("mn"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(merged ==
      base.as[(String, Long, Long, Long, Long)].collect().toSet)
  }

  test("retract drops zero-count keys and subtracts the rest") {
    def p(rows: Seq[(String, Long)]) =
      rows.toDF("k", "x").groupBy($"k")
        .agg(count(lit(1)).as("n"), sum($"x").as("s"))
    val base = p(Seq(("a", 5L), ("a", 7L), ("b", 1L)))
    val out = IncrementalAgg.retractPartials(
        base, p(Seq(("a", 5L), ("b", 1L))), Seq("k"),
        sumCols = Seq("n", "s"), countCol = "n")
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(("a", 1L, 7L)), s"got $out")
  }

  test("retract raises on non-subset deletes (absent key, below zero)") {
    def p(rows: Seq[(String, Long)]) =
      rows.toDF("k", "x").groupBy($"k")
        .agg(count(lit(1)).as("n"), sum($"x").as("s"))
    val base = p(Seq(("a", 5L)))
    val absent = intercept[Exception] {
      IncrementalAgg.retractPartials(base, p(Seq(("z", 1L))),
        Seq("k"), sumCols = Seq("n", "s"), countCol = "n").collect()
    }
    assert(absent.getMessage.contains("absent key") ||
      Option(absent.getCause).exists(_.getMessage.contains("absent key")),
      s"wrong error: $absent")
    val below = intercept[Exception] {
      IncrementalAgg.retractPartials(base,
        p(Seq(("a", 5L), ("a", 6L))),
        Seq("k"), sumCols = Seq("n", "s"), countCol = "n").collect()
    }
    assert(below.getMessage.contains("below zero") ||
      Option(below.getCause).exists(_.getMessage.contains("below zero")),
      s"wrong error: $below")
  }

  private def remaining(rows: Seq[(String, Long)]) =
    rows.toDF("k", "x").select($"k", $"x".as("mx"), $"x".as("mn"))

  test("retractWithRecompute re-derives extremes for touched keys " +
      "and passes untouched keys through") {
    // a: max (9) deleted -> recompute finds 5; b: untouched; c: min
    // (1) deleted -> recompute finds 4; d: fully deleted -> dropped
    val all = Seq(("a", 9L), ("a", 5L), ("a", 2L), ("b", 3L),
      ("c", 1L), ("c", 4L), ("d", 8L))
    val del = Seq(("a", 9L), ("c", 1L), ("d", 8L))
    val keep = all.diff(del)
    val out = IncrementalAgg.retractWithRecompute(
        partials(all), partials(del), remaining(keep),
        keys = Seq("k"), sumCols = Seq("n", "s"), countCol = "n",
        maxCols = Seq("mx"), minCols = Seq("mn"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val direct = partials(keep)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(out == direct, s"got $out")
    assert(out.map(_._1) == Set("a", "b", "c"))
  }

  test("retractWithRecompute raises when a deleted extreme exceeds " +
      "the maintained one (non-subset batch)") {
    val all = Seq(("a", 5L), ("a", 2L))
    val badDel = Seq(("a", 9L)) // 9 was never in history
    val err = intercept[Exception] {
      IncrementalAgg.retractWithRecompute(
        partials(all), partials(badDel), remaining(all),
        keys = Seq("k"), sumCols = Seq("n", "s"), countCol = "n",
        maxCols = Seq("mx"), minCols = Seq("mn")).collect()
    }
    assert(err.getMessage.contains("above maintained max") ||
      Option(err.getCause).exists(
        _.getMessage.contains("above maintained max")),
      s"wrong error: $err")
  }
}
