package graft

import org.apache.spark.sql.SparkSession

/** Dev-only stage profiler (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time(label: String, n: Int = 3)(
        df: => org.apache.spark.sql.DataFrame): Unit =
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[$label run$i] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    val names = if (args.isEmpty) Seq("q88_neardup_groups") else args.toSeq
    names.foreach { q =>
      time(q)(SparkEntry.queries(q)(spark, dir))
    }
    spark.stop()
  }
}
