package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Salting must change the distribution, never the answer. */
class SaltSpec extends SparkSpec {
  import spark.implicits._

  // heavy skew: key "hot" holds 90% of rows
  private lazy val skewed = (1 to 1000).map(i =>
    (i.toLong, if (i <= 900) "hot" else s"cold_${i % 7}"))
    .toDF("row_id", "key")

  test("saltedCount equals the plain count per key") {
    val plain = skewed.groupBy($"key").agg(count(lit(1)).as("n"))
    val salted = Salt.saltedCount(skewed, "key", "row_id", 8)
    assertDfEquality(salted, plain)
  }

  test("saltedJoin equals the plain join") {
    val dim = Seq(("hot", "H"), ("cold_1", "C1"), ("cold_2", "C2"))
      .toDF("key", "label")
    val plain = skewed.join(dim, Seq("key"))
      .select($"row_id", $"key", $"label")
    val salted = Salt.saltedJoin(skewed, dim, "key", "row_id", 8)
      .select($"row_id", $"key", $"label")
    assertDfEquality(salted, plain)
  }

  test("salt actually spreads the hot key") {
    val widths = skewed
      .withColumn("_salt", Salt.saltCol($"row_id", 8))
      .filter($"key" === "hot")
      .select($"_salt").distinct().count()
    assert(widths > 4, s"hot key should land in many salt buckets: $widths")
  }
}
