package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloom semi join ≡ plain semi join (pruning is invisible)") {
    val rng = new scala.util.Random(7)
    val fact = (0 until 5000).map(_ => rng.nextLong() % 1000)
      .toDF("k").withColumn("payload", $"k" * 2)
    val dim = (0 until 200).map(_ => rng.nextLong() % 1000).toDF("d")
    val got = BloomJoin.semiJoin(fact, dim, "k", "d",
      expectedItems = 200)
    val want = fact.join(dim.select($"d".as("k")).distinct(),
      Seq("k"), "left_semi")
    assertDfEquality(got, want)
  }

  test("empty dim prunes everything") {
    val fact = (0L until 100L).toDF("k")
    val dim = Seq.empty[Long].toDF("d")
    assert(BloomJoin.semiJoin(fact, dim, "k", "d", 1).count() == 0)
  }
}
