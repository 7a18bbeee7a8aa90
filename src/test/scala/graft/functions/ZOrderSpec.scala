package graft.functions

import graft.SparkSpec

/** Morton encoding vs a direct per-bit reference implementation. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def ref(x: Int, y: Int): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc |
        (((x >> i) & 1).toLong << (2 * i)) |
        (((y >> i) & 1).toLong << (2 * i + 1))
    }

  test("morton2 equals the per-bit reference on random 16-bit pairs") {
    val rng = new scala.util.Random(21)
    val pairs = Seq.fill(500)((rng.nextInt(65536), rng.nextInt(65536))) ++
      Seq((0, 0), (65535, 65535), (65535, 0), (0, 65535), (1, 2))
    val got = pairs.toDF("x", "y")
      .select($"x", $"y", ZOrder.morton2($"x", $"y").as("z"))
      .as[(Int, Int, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == ref(x, y), s"morton2($x,$y)=$z, want ${ref(x, y)}")
    }
  }

  test("corner values interleave to the expected constants") {
    val got = Seq((0, 0, 0L), (65535, 65535, 0xFFFFFFFFL),
        (65535, 0, 0x55555555L), (0, 65535, 0xAAAAAAAAL))
      .map { case (x, y, want) => (x, y, want) }
      .toDF("x", "y", "want")
      .select(ZOrder.morton2($"x", $"y").as("z"), $"want")
      .as[(Long, Long)].collect()
    got.foreach { case (z, want) => assert(z == want) }
  }
}
