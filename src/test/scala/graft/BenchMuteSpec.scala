package graft

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LogEvent
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.{Configurator, Property}

/** Regression guard for Bench's per-query warning mute (r11 ADVICE):
  * the mute must drop exactly the known-benign "No Partition Defined"
  * text — a DIFFERENT warning from the same WindowExec loggers, or
  * the same warning outside the muted block, must still reach the
  * log. The old implementation dropped the whole logger to ERROR for
  * the muted block, hiding any new warning those classes might emit.
  */
class BenchMuteSpec extends SparkSpec {

  test("muteGwinWarnings drops only the 'No Partition Defined' text; " +
    "other warnings from the same loggers pass through, and the mute " +
    "lifts after the block") {
    spark.range(1).count() // force session log4j2 init first
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val appender = new AbstractAppender("bench-mute-spec", null, null,
        false, Property.EMPTY_ARRAY) {
      override def append(event: LogEvent): Unit =
        seen.add(event.getMessage.getFormattedMessage)
    }
    appender.start()
    val ctx = LogManager.getContext(
      classOf[org.apache.spark.sql.execution.window.WindowExec]
        .getClassLoader, false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val cfg = ctx.getConfiguration
    val loggerName = Gwin.WindowLoggers.head
    Configurator.setLevel(loggerName, Level.WARN)
    cfg.getLoggerConfig(loggerName).addAppender(appender, Level.WARN, null)
    ctx.updateLoggers()
    // the log4j Logger the WindowExec class would use — emitting
    // through it exercises the LoggerConfig filter chain exactly as
    // Spark's own warning does
    val logger = ctx.getLogger(loggerName)
    try {
      Bench.muteGwinWarnings(mute = true) {
        logger.warn("No Partition Defined for Window operation! " +
          "(synthetic)")
        logger.warn("some brand-new WindowExec warning (synthetic)")
      }
      logger.warn("No Partition Defined after the block (synthetic)")
    } finally {
      cfg.getLoggerConfig(loggerName).removeAppender("bench-mute-spec")
      ctx.updateLoggers()
      appender.stop()
    }
    import scala.jdk.CollectionConverters._
    val msgs = seen.asScala.toList
    assert(!msgs.exists(m => m.contains("No Partition Defined") &&
      m.contains("(synthetic)") && !m.contains("after the block")),
      s"the muted benign warning leaked: $msgs")
    assert(msgs.exists(_.contains("brand-new WindowExec warning")),
      "a DIFFERENT warning from the muted logger was swallowed — " +
        s"the mute must discriminate on message content: $msgs")
    assert(msgs.exists(_.contains("after the block")),
      s"the mute did not lift after the block: $msgs")
  }
}
