package graft

/** Partitioning-independence sweep: every query's RESULT VALUES must
  * be identical under different shuffle widths — the engine's core
  * determinism claim (the DuckDB oracle compares one run; this pins
  * that no query's output depends on how rows happened to land in
  * partitions: no rand(), no first()-without-order, no
  * partial-ordered LIMIT).
  *
  * Executing all ~290 twice per `sbt test` is too slow, so each run
  * sweeps the 20 LEAST-RECENTLY-SWEPT queries and records the sweep
  * in `tools/determinism_ledger.txt` (query → sweep id) — the
  * committed ledger replaces the old file-count-seeded random sample,
  * whose coverage of the surface was unknowable (r8 verdict #5).
  * Least-recent selection guarantees every query is swept at least
  * once per ⌈N/20⌉ runs, new queries enter at sweep 0 and are picked
  * next; `tools/drift_check.py` fails the preflight when the ledger
  * drifts from the query surface or coverage goes stale.
  */
class DeterminismSpec extends SparkSpec {

  private val LedgerPath =
    java.nio.file.Paths.get("/root/repo/tools/determinism_ledger.txt")

  private def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  test("the 20 least-recently-swept queries return identical values " +
    "under shuffle widths 4 and 7 (ledger-rotated)") {
    val s4 = spark.newSession()
    val s7 = spark.newSession()
    s4.conf.set("spark.sql.shuffle.partitions", "4")
    s7.conf.set("spark.sql.shuffle.partitions", "7")
    val names = SparkEntry.allQueries.map(_.name).toSet
    val onDisk: Map[String, Long] =
      if (java.nio.file.Files.exists(LedgerPath))
        scala.jdk.CollectionConverters
          .ListHasAsScala(java.nio.file.Files.readAllLines(LedgerPath))
          .asScala.filter(_.nonEmpty).map { l =>
            val p = l.split(" ")
            p(0) -> p(1).toLong
          }.toMap
      else Map.empty
    // removed queries drop out; new queries enter at sweep 0 (= most
    // stale, picked immediately)
    val ledger = names.map(n => n -> onDisk.getOrElse(n, 0L)).toMap
    val sweepId = (ledger.values ++ Seq(0L)).max + 1L
    val sample = ledger.toSeq.sortBy { case (n, s) => (s, n) }
      .take(20).map(_._1)
    val failures = sample.flatMap { name =>
      try {
        val a = canon(SparkEntry.queries(name)(s4, sfDir).collect())
        val b = canon(SparkEntry.queries(name)(s7, sfDir).collect())
        if (a == b) None
        else Some(s"$name: ${a.size} vs ${b.size} rows; first diff: " +
          a.zipAll(b, "<missing>", "<missing>")
            .find { case (x, y) => x != y }
            .map { case (x, y) => s"$x != $y" }.getOrElse("?"))
      } catch {
        case e: Throwable => Some(s"$name: ${e.getMessage.take(200)}")
      }
    }
    // record only queries that actually passed the sweep, THEN fail
    // (match on "name:" — a bare prefix could collide across names)
    val swept = sample.filterNot(n =>
      failures.exists(_.startsWith(n + ":")))
    val updated = ledger ++ swept.map(_ -> sweepId)
    java.nio.file.Files.write(LedgerPath,
      updated.toSeq.sortBy(_._1)
        .map { case (n, s) => s"$n $s" }
        .mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(failures.isEmpty,
      s"sweep $sweepId: ${failures.size} queries are " +
        s"partition-dependent:\n${failures.mkString("\n")}")
  }
}
