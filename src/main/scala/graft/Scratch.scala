package graft


/** Dev-only stage profiler (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("32", logLevel = "ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(label: String, n: Int = 3)(
        df: => org.apache.spark.sql.DataFrame): Unit =
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[$label run$i] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    val names = if (args.isEmpty) Seq("q88_neardup_groups") else args.toSeq
    names.foreach { q =>
      time(q)(SparkEntry.benchQueries(q)(spark, dir))
    }
    spark.stop()
  }
}
