package graft

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LogEvent
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Mechanical sweep for the EAGER global-window blind spot found in
  * round 11: the ledger's `gwin=` counter walks each query's FINAL
  * plan, so a partition-less window that executes during query
  * CONSTRUCTION (inside a `localCheckpoint()`) never reaches it —
  * q239's apportionment windows fired 25 runtime warnings while its
  * ledger row said gwin=0.
  *
  * This spec runs EVERY query once at sf0.001 with a log4j2 appender
  * attached to the window-exec loggers and asserts that each "No
  * Partition Defined" warning attributes to a query that is either
  * ledger-allowlisted (gwin > 0 → GWIN_ALLOWLIST + GwinBoundsSpec
  * bound) or declared eager-bounded (`Gwin.EagerGwinAllowed` +
  * GwinBoundsSpec's eager section). A new single-partition funnel —
  * final-plan OR eager — now fails `sbt test` by name instead of
  * hiding in a bench log.
  */
class GwinWarningSweepSpec extends SparkSpec {

  // the allowlist and logger names come from ONE source — graft.Gwin
  // (which Bench's mute also reads), so a query rename breaks exactly
  // one declaration (r11 verdict ask #7)
  private val WindowLoggers = Gwin.WindowLoggers

  test("every 'No Partition Defined' warning across the full query " +
    "surface attributes to a ledger-gwin or declared-eager query") {
    // force FULL session init before wiring the appender: Spark's
    // first initialization reconfigures log4j2 (loads its
    // log4j2-defaults PropertiesConfiguration), which would silently
    // discard a previously-attached appender — the probe-caught
    // failure mode behind the vacuity tripwire below
    spark.range(1).count()
    val allowed = Gwin.ledgerAllowed ++ Gwin.EagerGwinAllowed

    // attribution: ATTRIBUTED queries run strictly sequentially, so a
    // volatile "current query" is exact up to warnings emitted by
    // lazy background cleanup after save() returns — none of Spark's
    // cleanup paths plan windows, so that race is theoretical.
    // Non-allowlisted queries must emit ZERO warnings, so they sweep
    // 8-way concurrently under one aggregate key (suite wall time,
    // r12 verdict #1) and only re-run sequentially if that aggregate
    // is nonzero — attribution is only needed to NAME an offender.
    @volatile var current: String = "<none>"
    val hits = new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicInteger]()
    val appender = new AbstractAppender("gwin-sweep", null, null,
        false, Property.EMPTY_ARRAY) {
      override def append(event: LogEvent): Unit = {
        if (event.getMessage.getFormattedMessage
            .contains(Gwin.WarningText)) {
          hits.computeIfAbsent(current,
            _ => new java.util.concurrent.atomic.AtomicInteger())
            .incrementAndGet()
        }
      }
    }
    appender.start()
    // resolve the context through SPARK's classloader: under sbt's
    // layered test classloader, getContext(false) from test code can
    // return a DIFFERENT LoggerContext than the one the Spark jars'
    // loggers live in, and an appender added there captures nothing
    // (the vacuity tripwire below caught exactly this)
    val ctx = LogManager.getContext(
      classOf[org.apache.spark.sql.execution.window.WindowExec]
        .getClassLoader, false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val cfg = ctx.getConfiguration
    // ensure the loggers pass WARN events to our appender regardless
    // of the session's console level
    WindowLoggers.foreach { n =>
      org.apache.logging.log4j.core.config.Configurator
        .setLevel(n, Level.WARN)
      cfg.getLoggerConfig(n).addAppender(appender, Level.WARN, null)
    }
    ctx.updateLoggers()
    try {
      val all = SparkEntry.queries.toSeq.sortBy(_._1)
      val (attributed, silent) =
        all.partition { case (name, _) => allowed(name) }
      def sweepOne(name: String,
          fn: (org.apache.spark.sql.SparkSession, String)
            => org.apache.spark.sql.DataFrame): Unit =
        try fn(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case scala.util.control.NonFatal(e) =>
          fail(s"$name failed to run during the gwin sweep: $e") }
      // phase 1 — the ~300 queries that must not warn at all, 8-way
      // concurrent under one aggregate key
      current = "<silent-sweep>"
      PlanScan.sweep8(silent) { case (name, fn) => sweepOne(name, fn) }
      if (hits.containsKey("<silent-sweep>")) {
        // someone warned: re-run this group sequentially so the
        // failure names the offender (slow path, failure only). The
        // aggregate count stays in `hits` under a non-allowed key, so
        // the final assert fails even if the re-run cannot reproduce
        // the warning — a concurrent hit is never swallowed.
        silent.foreach { case (name, fn) =>
          current = name
          sweepOne(name, fn)
        }
      }
      // phase 2 — the allowlisted queries, sequential for exact
      // attribution (the vacuity check below needs per-query hits)
      attributed.foreach { case (name, fn) =>
        current = name
        sweepOne(name, fn)
      }
      current = "<after>"
    } finally {
      WindowLoggers.foreach { n =>
        cfg.getLoggerConfig(n).removeAppender("gwin-sweep")
      }
      ctx.updateLoggers()
      appender.stop()
    }
    import scala.jdk.CollectionConverters._
    val offenders = hits.asScala.collect {
      case (q, n) if !allowed(q) => s"$q ($n warnings)"
    }.toSeq.sorted
    assert(offenders.isEmpty,
      s"single-partition window warnings from queries that are " +
        "neither ledger-gwin-allowlisted nor declared eager-bounded " +
        s"(add a GwinBoundsSpec bound + declaration, or rewrite via " +
        s"PrefixSum): ${offenders.mkString(", ")}")
    // the sweep must actually SEE the known warners — an appender
    // wiring regression would otherwise pass vacuously
    assert(Gwin.EagerGwinAllowed.forall(hits.containsKey),
      s"declared eager queries emitted no warning — either the eager " +
        "window is gone (remove the declaration) or the appender " +
        s"wiring broke; saw: ${hits.keySet().asScala.toSeq.sorted}")
  }
}
