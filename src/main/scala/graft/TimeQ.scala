package graft

/** Dev harness: time named queries solo (3 passes each, noop sink) —
  * the single-query companion to [[Bench]]'s full sweep, for plan
  * iteration without a 310-label run. Not part of the driver
  * contract.
  *
  * `runMain graft.TimeQ <sfDir> <query>...`
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("32", logLevel = "ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    for (q <- args.drop(1)) {
      val fn = SparkEntry.queries(q)
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"[time] $q pass$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
