package graft.operators

import graft.SparkSpec

/** Sweep-line concurrency: hand-checkable interval fixtures. */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  test("maxConcurrent counts overlapping intervals") {
    // [1,3) [2,4) overlap → 2; [5,6) alone → still max 2 for key g1
    val iv = Seq(
      ("g1", 1L, 3L), ("g1", 2L, 4L), ("g1", 5L, 6L),
      ("g2", 10L, 11L))
      .toDF("g", "s", "e")
    val got = Intervals.maxConcurrent(iv, Seq("g"), "s", "e")
      .as[(String, Long)].collect().toMap
    assert(got == Map("g1" -> 2L, "g2" -> 1L))
  }

  test("exclusive ends: touching intervals do not overlap") {
    val iv = Seq(("g", 1L, 2L), ("g", 2L, 3L), ("g", 3L, 4L))
      .toDF("g", "s", "e")
    val got = Intervals.maxConcurrent(iv, Seq("g"), "s", "e")
      .as[(String, Long)].collect().toMap
    assert(got == Map("g" -> 1L))
  }

  test("nested and identical intervals all count") {
    val iv = Seq(("g", 1L, 10L), ("g", 2L, 9L), ("g", 2L, 9L),
        ("g", 3L, 4L))
      .toDF("g", "s", "e")
    val got = Intervals.maxConcurrent(iv, Seq("g"), "s", "e")
      .as[(String, Long)].collect().toMap
    assert(got == Map("g" -> 4L))
  }

  test("mergeOverlaps: overlap and touch merge, gaps split") {
    // [1,3)+[2,5) overlap, [5,6) touches (end==start merges),
    // [8,9) gapped → 2 islands
    val iv = Seq(
      ("g", 1L, 3L), ("g", 2L, 5L), ("g", 5L, 6L), ("g", 8L, 9L),
      ("h", 1L, 2L))
      .toDF("g", "s", "e")
    val got = Intervals.mergeOverlaps(iv, Seq("g"), "s", "e")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("g", 1L, 1L, 6L, 3L), ("g", 2L, 8L, 9L, 1L),
      ("h", 1L, 1L, 2L, 1L)))
  }

  test("mergeOverlaps: nested and duplicate intervals collapse") {
    val iv = Seq(("g", 1L, 10L), ("g", 2L, 3L), ("g", 2L, 3L),
        ("g", 4L, 12L))
      .toDF("g", "s", "e")
    val got = Intervals.mergeOverlaps(iv, Seq("g"), "s", "e")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(("g", 1L, 1L, 12L, 4L)))
  }
}
