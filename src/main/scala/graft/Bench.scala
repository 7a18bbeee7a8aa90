package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus)
    // warmup: run EVERY query once at the smallest SF. The schemas are
    // identical across SFs, so each query's generated code and JIT'd
    // hot loops are exactly the ones the measured run executes —
    // first-run numbers otherwise carry 2-5 s of Janino compilation
    // and interpreter-mode execution that no steady-state deployment
    // would see.
    // warmup runs 8 queries at a time — Spark schedules concurrent
    // jobs from separate threads fine, and the tiny sf0.001 jobs
    // underutilize local[32] one at a time
    val warmDir = "/root/testdata/sf0.001"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val warmups = SparkEntry.queries.toSeq.map { case (_, fn) =>
      scala.concurrent.Future {
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(warmups),
      scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    // settle before measuring: the warmup leaves cached plans plus a
    // GC + ContextCleaner backlog (broadcast/shuffle cleanup runs
    // async) that otherwise lands on whichever queries run first
    spark.catalog.clearCache()
    System.gc()
    Thread.sleep(3000)
    var errors = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: materializes every output column (a bare .count()
      // would let Catalyst prune all per-row computation away and
      // under-measure projection-heavy queries)
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case _: Throwable => errors ::= name; false }
      // failed queries get a -1 sentinel so a crash is never mistaken
      // for a fast success
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // Locale.ROOT: a comma-decimal default locale would print "1,234"
    // and corrupt the machine-parsed JSON line
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val errJson = errors.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
