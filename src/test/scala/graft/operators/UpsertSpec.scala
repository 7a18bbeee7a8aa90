package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("mergeUpsert: delta wins, non-conflicting rows carried") {
    val existing = Seq((1L, "a", 10), (2L, "b", 20))
      .toDF("id", "name", "score")
    val delta = Seq((2L, "B", 99), (3L, "c", 30))
      .toDF("id", "name", "score")
    val got = Upsert.mergeUpsert(existing, delta, Seq("id"))
    val expected = Seq((1L, "a", 10), (2L, "B", 99), (3L, "c", 30))
      .toDF("id", "name", "score")
    assertDfEquality(got, expected)
  }

  test("applyChangelog with seqCol: the highest-sequence op per key " +
    "wins, no duplicated keys") {
    val snapshot = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    // key 2: updated then deleted → gone; key 3: inserted then
    // updated → one row with the final image
    val changes = Seq(
      (2L, "B", "U", 1), (2L, "B", "D", 2),
      (3L, "c", "I", 1), (3L, "C", "U", 2))
      .toDF("id", "v", "op", "seq")
    val got = Upsert.applyChangelog(snapshot, changes, Seq("id"),
      seqCol = Some("seq"))
    assertDfEquality(got, Seq((1L, "a"), (3L, "C")).toDF("id", "v"))
  }

  test("applyChangelog with seqCol fails loudly on a max-sequence TIE " +
    "instead of picking a nondeterministic survivor") {
    val snapshot = Seq((1L, "a")).toDF("id", "v")
    // same seq for a U and a D on one key: whichever row_number picked
    // would flip the key's presence run-to-run — must raise instead
    val changes = Seq((1L, "x", "U", 5), (1L, "y", "D", 5))
      .toDF("id", "v", "op", "seq")
    val ex = intercept[Exception] {
      Upsert.applyChangelog(snapshot, changes, Seq("id"),
        seqCol = Some("seq")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("ties on max seq")),
      s"unexpected error: $ex")
  }

  test("applyChangelog with seqCol: distinct sequences with a repeated " +
    "lower value still resolve (ties below the max are harmless)") {
    val snapshot = Seq((1L, "a")).toDF("id", "v")
    val changes = Seq((1L, "x", "U", 1), (1L, "y", "U", 1), (1L, "z", "U", 3))
      .toDF("id", "v", "op", "seq")
    val got = Upsert.applyChangelog(snapshot, changes, Seq("id"),
      seqCol = Some("seq"))
    assertDfEquality(got, Seq((1L, "z")).toDF("id", "v"))
  }

  test("applyChangelog without seqCol fails loudly on a multi-op key " +
    "instead of silently duplicating it") {
    val snapshot = Seq((1L, "a")).toDF("id", "v")
    val changes = Seq((1L, "x", "U"), (1L, "y", "U"))
      .toDF("id", "v", "op")
    val ex = intercept[Exception] {
      Upsert.applyChangelog(snapshot, changes, Seq("id")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("multiple ops for key")),
      s"unexpected error: $ex")
  }

  test("applyChangelog without seqCol: unique-key changelog applies " +
    "as before") {
    val snapshot = Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("id", "v")
    val changes = Seq((2L, "B", "U"), (3L, "c", "I"), (4L, "d", "D"))
      .toDF("id", "v", "op")
    val got = Upsert.applyChangelog(snapshot, changes, Seq("id"))
    assertDfEquality(got,
      Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "v"))
  }

  test("overwritePartitions replaces only the delta's partitions") {
    try {
      Seq((1, "2024-01-01"), (2, "2024-01-01"), (3, "2024-01-02"))
        .toDF("v", "ds")
        .write.partitionBy("ds").saveAsTable("u_part")
      // rerun day 2 with corrected data; day 1 must be untouched
      Upsert.overwritePartitions(spark,
        Seq((99, "2024-01-02")).toDF("v", "ds"), "u_part")
      val got = spark.table("u_part").orderBy($"v")
        .as[(Int, String)].collect().toSeq
      assert(got == Seq((1, "2024-01-01"), (2, "2024-01-01"),
        (99, "2024-01-02")))
    } finally spark.sql("DROP TABLE IF EXISTS u_part")
  }
}
