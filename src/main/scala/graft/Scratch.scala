package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"

    def time(label: String, n: Int = 3)(
        df: => org.apache.spark.sql.DataFrame): Unit =
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[$label run$i] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    val li = core.Tables.load(spark, dir, "lineitem")



    // variant A: collect_set then double explode
    def variantA = {
      val bySupp = li.groupBy($"l_partkey")
        .agg(collect_set($"l_suppkey").as("supps"))
      bySupp
        .select($"supps", explode($"supps").as("supp_a"))
        .select($"supp_a",
          explode(filter($"supps", x => x < $"supp_a")).as("supp_b"))
        .groupBy($"supp_a", $"supp_b")
        .agg(count(lit(1)).as("shared_parts"))
        .filter($"shared_parts" >= 3)
        .orderBy($"supp_a", $"supp_b")
    }
    time("doubleExplode")(variantA)

    // variant B: classic self-join on distinct (part, supp)
    def variantB = {
      val ps = li.select($"l_partkey", $"l_suppkey").distinct()
      val a = ps.as("a"); val b = ps.as("b")
      a.join(b, $"a.l_partkey" === $"b.l_partkey" &&
          $"a.l_suppkey" > $"b.l_suppkey")
        .groupBy($"a.l_suppkey".as("supp_a"), $"b.l_suppkey".as("supp_b"))
        .agg(count(lit(1)).as("shared_parts"))
        .filter($"shared_parts" >= 3)
        .orderBy($"supp_a", $"supp_b")
    }
    time("selfJoin")(variantB)

    // stage isolation
    val bySupp = li.groupBy($"l_partkey")
      .agg(collect_set($"l_suppkey").as("supps"))
    val pairs = bySupp
      .select($"supps", explode($"supps").as("supp_a"))
      .select($"supp_a",
        explode(filter($"supps", x => x < $"supp_a")).as("supp_b"))
    println("n_pairs=" + pairs.count())
    time("pairs_only")(pairs)
    time("pairs_agg")(pairs.groupBy($"supp_a", $"supp_b")
      .agg(count(lit(1)).as("shared_parts")))
    time("pairs_agg_repart")(pairs
      .repartition(32, $"supp_a", $"supp_b")
      .groupBy($"supp_a", $"supp_b")
      .agg(count(lit(1)).as("shared_parts")))
    val packed = bySupp
      .select($"supps", explode($"supps").as("supp_a"))
      .select(explode(transform(filter($"supps", x => x < $"supp_a"),
        b => shiftleft($"supp_a".cast("long"), 32) + b.cast("long")))
        .as("pk"))
    time("packed_agg_repart")(packed
      .repartition(32, $"pk")
      .groupBy($"pk")
      .agg(count(lit(1)).as("shared_parts"))
      .filter($"shared_parts" >= 3)
      .select(shiftright($"pk", 32).cast("int").as("supp_a"),
        ($"pk".bitwiseAND(lit(0xffffffffL))).cast("int").as("supp_b"),
        $"shared_parts"))
    spark.stop()
  }
}
