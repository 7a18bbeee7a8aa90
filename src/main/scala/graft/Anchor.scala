package graft

/** Solo steady-state anchor (r11 verdict ask #1): times the named
  * queries ONE AT A TIME — warmup pass at sf0.001, settle, then 3
  * timed passes each at the target SF, reporting the median — and
  * writes a snapshot in BENCH_local schema (so bench_compare.py's
  * load()/calib() work on it unchanged). Solo timing removes the
  * in-sweep contention (warmup GC backlog, neighbor queries) that
  * made three consecutive full-sweep snapshots host-noise-bound in
  * r9b–r11b; two anchors from different rounds gate engine drift on
  * the top queries directly (preflight stage 5).
  *
  * `runMain graft.Anchor <sfDir> <outPath> <query>...`
  * (tools/make_anchor.py picks the top-N queries from the newest
  * committed full-sweep snapshot and invokes this.)
  */
object Anchor {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: runMain graft.Anchor <sfDir> <outPath> <query>...")
    val sfDir = args(0)
    val outPath = args(1)
    val names = args.drop(2).toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus)
    // JIT/codegen warmup at the smallest SF (the Bench discipline)
    names.foreach { q =>
      try SparkEntry.benchQueries(q)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    spark.catalog.clearCache()
    System.gc()
    Thread.sleep(2000)
    val calibCpu = graft.core.Calib.median3(graft.core.Calib.cpuMd5())
    val calibSpark =
      graft.core.Calib.median3(graft.core.Calib.sparkRange(spark))
    val results = names.map { q =>
      val fn = SparkEntry.benchQueries(q)
      val ts = (1 to 3).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case scala.util.control.NonFatal(_) => None }
      }
      q -> (if (ts.nonEmpty) ts.sorted.apply(ts.size / 2) else -1.0)
    }
    val errors = results.collect { case (q, t) if t < 0 => q }
    val total = results.map(_._2).filter(_ >= 0).sum
    val json = BenchFormat.fullJson(results, total, runs = 3,
      calibCpu, calibSpark, errors, sfDir)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[anchor] wrote ${results.size} solo medians to $outPath " +
      f"(calib cpu=$calibCpu%.3f spark=$calibSpark%.3f)")
    spark.stop()
  }
}
