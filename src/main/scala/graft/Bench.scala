package graft
object Bench {

  /** Run `f` with the global-window warning muted — ONLY for queries
    * [[Gwin]] allowlists (ledger gwin= rows with GwinBoundsSpec
    * bounds, or declared eager-bounded). Their warnings are
    * indistinguishable in the log from a real scale-killer's, so
    * muting them makes a NEW unbounded-window warning stand out in
    * the bench tail instead of drowning among the known-benign ones.
    *
    * Muted by message CONTENT, not logger level (r11 ADVICE): a
    * log4j2 filter drops exactly the "No Partition Defined" text, so
    * a different WindowExec warning from an allowlisted query still
    * surfaces — the same discrimination GwinWarningSweepSpec applies.
    */
  private[graft] def muteGwinWarnings[A](mute: Boolean)(f: => A): A = {
    if (!mute) return f
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.{Filter, LogEvent, LoggerContext}
    import org.apache.logging.log4j.core.config.Configurator
    import org.apache.logging.log4j.core.filter.AbstractFilter
    val muteFilter = new AbstractFilter(
        Filter.Result.DENY, Filter.Result.NEUTRAL) {
      override def filter(event: LogEvent): Filter.Result =
        if (event.getMessage.getFormattedMessage
            .contains(Gwin.WarningText)) Filter.Result.DENY
        else Filter.Result.NEUTRAL
    }
    // resolve the context through SPARK's classloader (the sweep
    // spec's lesson: under layered classloaders the default context
    // can differ from the one the Spark jars' loggers live in)
    val ctx = LogManager.getContext(
      classOf[org.apache.spark.sql.execution.window.WindowExec]
        .getClassLoader, false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    // setLevel first (at the current effective level — no level
    // change): it materializes a SPECIFIC LoggerConfig per logger, so
    // the filter attaches there and never to the root config
    Gwin.WindowLoggers.foreach { n =>
      Configurator.setLevel(n, LogManager.getLogger(n).getLevel)
      cfg.getLoggerConfig(n).addFilter(muteFilter)
    }
    ctx.updateLoggers()
    try f
    finally {
      Gwin.WindowLoggers.foreach(n =>
        cfg.getLoggerConfig(n).removeFilter(muteFilter))
      ctx.updateLoggers()
    }
  }

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
    // warmup is 8-way concurrent, so per-query mute scoping is
    // impossible here — mute globally for its duration; a real
    // scale-killer's warning still surfaces unmuted in the measured
    // passes below
    muteGwinWarnings(mute = true) {
      val warmups = SparkEntry.benchQueries.toSeq.map { case (_, fn) =>
        scala.concurrent.Future {
          try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
          catch { case scala.util.control.NonFatal(_) => () }
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(warmups),
        scala.concurrent.duration.Duration.Inf)
    }
    pool.shutdown()
    // settle before measuring: the warmup leaves cached plans plus a
    // GC + ContextCleaner backlog (broadcast/shuffle cleanup runs
    // async) that otherwise lands on whichever queries run first
    spark.catalog.clearCache()
    System.gc()
    Thread.sleep(3000)
    // host-speed calibration pair (graft.core.Calib — shared with
    // graft.Anchor so full-sweep snapshots and solo-anchor tables
    // normalize identically)
    val calibCpu = graft.core.Calib.median3(graft.core.Calib.cpuMd5())
    val calibSpark =
      graft.core.Calib.median3(graft.core.Calib.sparkRange(spark))
    // 3 ALTERNATING full passes, reporting the per-query MEDIAN: a
    // transient VM stall (noisy neighbor, GC storm) hits one contiguous
    // stretch of ONE pass, so the median of three passes separated in
    // time is immune — a single-run bench once reported 54 s for a query
    // whose steady-state cost is 0.85 s. Alternating whole passes (not
    // back-to-back repeats of each query) is what buys that time
    // separation.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val names = SparkEntry.benchQueries.toSeq.sortBy(_._1).map(_._1)
    val times =
      scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (_ <- 1 to runs; name <- names) {
      val fn = SparkEntry.benchQueries(name)
      val t0 = System.nanoTime()
      // noop sink: materializes every output column (a bare .count()
      // would let Catalyst prune all per-row computation away and
      // under-measure projection-heavy queries)
      try {
        muteGwinWarnings(Gwin.allowed(name)) {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        }
        times(name) = ((System.nanoTime() - t0) / 1e9) :: times(name)
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    def median(xs: List[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // a query only counts as errored if it failed in EVERY pass; -1
    // sentinel so a crash is never mistaken for a fast success
    val results = names.map { name =>
      val ts = times(name)
      name -> (if (ts.nonEmpty) median(ts) else -1.0)
    }
    val errors = names.filter(times(_).isEmpty)
    // headline total sums the ORACLE-CHECKED queries only, so it stays
    // comparable across rounds; bench-only attribution labels (q240a/b)
    // report in "queries" but don't double-count the work q240 already
    // counts
    val total = results
      .filter { case (k, _) => SparkEntry.queries.contains(k) }
      .map(_._2).filter(_ >= 0).sum
    // full payload to a FILE, one compact ≤1900-byte line to stdout —
    // the driver keeps only the last ~2000 stdout chars, and round 9's
    // single 12 KB line came back front-truncated (parsed: null). See
    // BenchFormat for the contract.
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL",
      "/root/repo/BENCH_FULL.json")
    val fullJson = BenchFormat.fullJson(results, total, runs, calibCpu,
      calibSpark, errors, sfDir)
    try java.nio.file.Files.write(java.nio.file.Paths.get(fullPath),
      (fullJson + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] could not write $fullPath: $e")
    }
    println(BenchFormat.compactLine(results, total, runs, calibCpu,
      calibSpark, errors, sfDir, fullPath))
    spark.stop()
  }
}
