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

    // variant A: filter-lambda pairs (old q17)
    def variantA = {
      val bySupp = li.groupBy($"l_partkey")
        .agg(collect_set($"l_suppkey").as("supps"))
      bySupp
        .select($"supps", explode($"supps").as("supp_a"))
        .select($"supp_a",
          explode(filter($"supps", x => x < $"supp_a")).as("supp_b"))
        .repartition(32, $"supp_a", $"supp_b")
        .groupBy($"supp_a", $"supp_b")
        .agg(count(lit(1)).as("shared_parts"))
        .filter($"shared_parts" >= 3)
        .orderBy($"supp_a", $"supp_b")
    }
    time("filterLambda")(variantA)

    // variant B: sorted slice pairs (Graph.coPairs)
    def variantB =
      operators.Graph.coPairs(li, $"l_partkey", $"l_suppkey", 32)
        .select($"item_b".as("supp_a"), $"item_a".as("supp_b"),
          $"n".as("shared_parts"))
        .filter($"shared_parts" >= 3)
        .orderBy($"supp_a", $"supp_b")
    time("sortedSlice")(variantB)

    // variant C: pack the pair into one long before the shuffle
    def variantC = {
      val pairs = li.groupBy($"l_partkey")
        .agg(sort_array(collect_set($"l_suppkey")).as("_items"))
        .select($"_items", posexplode($"_items").as(Seq("_pos", "b")))
        .select($"b",
          explode_outer(slice($"_items", lit(1), $"_pos")).as("a"))
        .filter($"a".isNotNull)
        .select((shiftleft($"b".cast("long"), 32)
          .bitwiseOR($"a".cast("long"))).as("pk"))
      pairs
        .repartition(32, $"pk")
        .groupBy($"pk")
        .agg(count(lit(1)).as("shared_parts"))
        .filter($"shared_parts" >= 3)
        .select(shiftright($"pk", 32).cast("int").as("supp_a"),
          $"pk".bitwiseAND(lit(0xffffffffL)).cast("int").as("supp_b"),
          $"shared_parts")
        .orderBy($"supp_a", $"supp_b")
    }
    time("packedLong")(variantC)

    spark.stop()
  }
}
