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

    // q17 stage isolation
    val sets = li.groupBy($"l_partkey")
      .agg(sort_array(collect_set($"l_suppkey")).as("_items"))
    time("1_sets_only")(sets)
    val gen = sets
      .select($"_items", posexplode($"_items").as(Seq("_pos", "b")))
      .select($"b",
        explode_outer(slice($"_items", lit(1), $"_pos")).as("a"))
      .filter($"a".isNotNull)
      .select(shiftleft($"b".cast("long"), 32)
        .bitwiseOR($"a".cast("long")).as("pk"))
    time("2_gen_pairs")(gen)
    val agg = gen.repartition(32, $"pk").groupBy($"pk")
      .agg(count(lit(1)).as("n")).filter($"n" >= 3)
    time("3_pair_agg")(agg)
    time("4_full_q17")(SparkEntry.queries("q17_join_pairs")(spark, dir))
    spark.stop()
  }
}
