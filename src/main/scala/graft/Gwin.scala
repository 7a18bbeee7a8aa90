package graft

/** THE single source for the bounded global-window allowlist (r11
  * verdict ask #7): `Bench`'s per-query warning mute and
  * `GwinWarningSweepSpec`'s attribution allowlist both read THIS
  * object, which itself derives from the committed exchange ledger's
  * `gwin=` counts (the same rows drift_check and GwinBoundsSpec gate)
  * plus the one declared-eager set below. A query rename now breaks
  * exactly one declaration — previously Bench.scala and the sweep
  * spec each parsed the ledger and Bench carried the eager set, a
  * three-artifact coupling a rename could silently skew.
  */
object Gwin {

  /** Loggers behind Spark's "No Partition Defined for Window
    * operation!" warning (emitted by WindowExecBase; the Logging
    * trait names the logger after the CONCRETE node class).
    */
  val WindowLoggers: Seq[String] = Seq(
    "org.apache.spark.sql.execution.window.WindowExec",
    "org.apache.spark.sql.execution.window.WindowGroupLimitExec")

  /** The warning text the mute keys on — matched on message CONTENT
    * (r11 ADVICE), so a NEW, different WindowExec warning from an
    * allowlisted query still surfaces.
    */
  val WarningText = "No Partition Defined"

  /** Repo root for the committed ledger — overridable so a checkout
    * at another path doesn't silently read no ledger (r11 ADVICE:
    * the old hard-coded /root/repo swallowed that case without a
    * diagnostic).
    */
  private def repoRoot: String =
    sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo")

  /** Queries allowlisted for a bounded-input partition-less window,
    * read from the committed exchange ledger's gwin= counts (the same
    * source drift_check + GwinBoundsSpec gate) — so the mute list
    * can't drift from the allowlist. A read failure logs to stderr
    * and un-mutes everything (the benign direction: extra warnings,
    * never hidden ones).
    */
  lazy val ledgerAllowed: Set[String] = {
    val path = s"$repoRoot/EXCHANGES.txt"
    try {
      val src = scala.io.Source.fromFile(path)
      try src.getLines().flatMap { l =>
        val parts = l.trim.split("\\s+")
        val g = parts.collectFirst {
          case s if s.startsWith("gwin=") => s.drop(5).toInt
        }
        if (parts.nonEmpty && g.exists(_ > 0)) Some(parts(0)) else None
      }.toSet
      finally src.close()
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[gwin] cannot read $path ($e) — no " +
          "queries will be gwin-muted (set SPARK_GRAFT_REPO to the " +
          "checkout root)")
        Set.empty
    }
  }

  /** Queries whose BOUNDED partition-less windows execute EAGERLY
    * (inside a localCheckpoint during query construction) — invisible
    * to the final-plan ledger (their gwin= is 0) yet still warning at
    * runtime. Each entry's boundedness is executable in
    * GwinBoundsSpec's eager section (drift_check 7b enforces that).
    * Found round 11: q239's apportionment windows
    * (allocateLargestRemainder over the per-source stratum table) run
    * under `alloc.localCheckpoint()`.
    */
  val EagerGwinAllowed: Set[String] = Set("q239_stratified_sample")

  def allowed(name: String): Boolean =
    ledgerAllowed(name) || EagerGwinAllowed(name)
}
