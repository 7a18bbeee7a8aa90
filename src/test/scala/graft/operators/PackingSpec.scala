package graft.operators

import graft.SparkSpec

/** Hand-checkable next-fit packing fixtures. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  // shard 0, cap 10: [4, 5] fill bin 1 to 9; 3 opens bin 2; 12 is an
  // overflow doc (own bin, never merged into); 2+6 reuse bin 4; 1
  // fits bin 4 too (2+6+1=9)
  test("nextFitFills folds in order, atomically, flagging overflow") {
    val docs = Seq(
      (0L, 1L, 4L), (0L, 2L, 5L), (0L, 3L, 3L), (0L, 4L, 12L),
      (0L, 5L, 2L), (0L, 6L, 6L), (0L, 7L, 1L),
      (1L, 1L, 10L))
      .toDF("shard", "pos", "n")
    val got = Packing.nextFitFills(docs, "shard", "pos", "n", cap = 10L)
      .select($"shard", $"fills")
      .as[(Long, Seq[Long])].collect().toMap
    assert(got == Map(0L -> Seq(9L, 3L, 12L, 9L), 1L -> Seq(10L)))
  }

  test("nextFitStats: pad skips overflow bins; checksum pins order") {
    val docs = Seq(
      (0L, 1L, 4L), (0L, 2L, 5L), (0L, 3L, 3L), (0L, 4L, 12L),
      (0L, 5L, 2L), (0L, 6L, 6L), (0L, 7L, 1L))
      .toDF("shard", "pos", "n")
    val got = Packing.nextFitStats(docs, "shard", "pos", "n", cap = 10L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toList
    // fills = [9, 3, 12, 9]: pad = 1+7+0+1, overflow = 1,
    // checksum = 9·1 + 3·2 + 12·3 + 9·4 = 87
    assert(got ==
      List((0L, 7L, 33L, 4L, 9L, 1L, 87L)))
  }

  test("collection order never leaks into the fold") {
    // rows arrive shuffled across many partitions; orderCol rules
    val docs = spark.range(0, 200)
      .selectExpr("id DIV 50 AS shard", "id AS pos",
        "(id * 37) % 13 + 1 AS n")
      .repartition(16)
    val fills = Packing.nextFitFills(docs, "shard", "pos", "n", 16L)
      .select($"shard", $"fills").as[(Long, Seq[Long])].collect().toMap
    def ref(items: Seq[Long]): Seq[Long] =
      items.foldLeft(Vector.empty[Long]) { (acc, n) =>
        if (acc.nonEmpty && acc.last + n <= 16L)
          acc.init :+ (acc.last + n)
        else acc :+ n
      }
    (0L to 3L).foreach { s =>
      val items = (s * 50 until (s + 1) * 50).map(i => (i * 37) % 13 + 1)
      assert(fills(s) == ref(items), s"shard $s")
    }
  }
}
