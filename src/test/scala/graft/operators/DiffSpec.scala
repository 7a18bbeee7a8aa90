package graft.operators

import graft.SparkSpec

class DiffSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val before = Seq(
      (1L, "a", 10),                    // unchanged
      (2L, "b", 20),                    // changed (attr)
      (3L, "c", 30),                    // removed
      (5L, null.asInstanceOf[String], 50)) // changed: null → value
      .toDF("id", "s", "n")
    val after = Seq(
      (1L, "a", 10),
      (2L, "b", 99),
      (4L, "d", 40),                    // added
      (5L, "now", 50))
      .toDF("id", "s", "n")
    val got = Diff.snapshotDiff(before, after, Seq("id"))
      .select($"id", $"change_type").as[(Long, String)]
      .collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added", 5L -> "changed"))
  }

  test("snapshotDiff: NULL == NULL is unchanged (null-safe compare)") {
    val before = Seq((1L, null.asInstanceOf[String])).toDF("id", "s")
    val after = Seq((1L, null.asInstanceOf[String])).toDF("id", "s")
    val got = Diff.snapshotDiff(before, after, Seq("id"))
      .select($"change_type").as[String].head()
    assert(got == "unchanged")
  }

  test("round trip: applyChangelog(before, diff) reproduces after") {
    import org.apache.spark.sql.functions._
    val before = Seq(
      (1L, "a", 10), (2L, "b", 20), (3L, "c", 30),
      (5L, null.asInstanceOf[String], 50))
      .toDF("id", "s", "n")
    val after = Seq(
      (1L, "a", 10), (2L, "b", 99), (4L, "d", 40), (5L, "now", 50))
      .toDF("id", "s", "n")
    // a diff IS a changelog: added→I, changed→U (after image), removed→D
    val changelog = Diff.snapshotDiff(before, after, Seq("id"))
      .filter($"change_type" =!= "unchanged")
      .select($"id", $"s_after".as("s"), $"n_after".as("n"),
        when($"change_type" === "added", "I")
          .when($"change_type" === "changed", "U")
          .otherwise("D").as("op"))
    val got = Upsert.applyChangelog(before, changelog, Seq("id"))
    assertDfEquality(got, after)
  }

  test("a NULL-keyed row present in both snapshots is one row, " +
    "not removed + added") {
    val before = Seq((Option.empty[java.lang.Long], "x"),
      (Option(1L): Option[java.lang.Long], "a")).toDF("id", "s")
    val after = Seq((Option.empty[java.lang.Long], "y"),
      (Option(1L): Option[java.lang.Long], "a")).toDF("id", "s")
    val got = Diff.snapshotDiff(before, after, Seq("id"))
      .select($"change_type").as[String].collect().sorted.toSeq
    assert(got == Seq("changed", "unchanged"),
      s"NULL-safe key join must match NULL keys across sides: $got")
  }
}
