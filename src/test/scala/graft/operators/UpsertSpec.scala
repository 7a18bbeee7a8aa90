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
