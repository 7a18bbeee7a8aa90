package graft

/** Exchange-count regression pin: every query's pre-AQE physical plan
  * must carry exactly the shuffle/broadcast exchange counts recorded in
  * the checked-in EXCHANGES.txt ledger. A silent +1 shuffle (lost
  * bucketing, dropped broadcast hint, an optimizer barrier from a
  * refactor) is invisible to the correctness gate and only shows up as
  * a bench regression rounds later — this turns it into a named test
  * failure the same `sbt test`. After a DELIBERATE plan change, review
  * the diff and regenerate:
  * `sbt "runMain graft.PlanScan exchanges /root/testdata/sf0.001 EXCHANGES.txt"`.
  */
class ExchangeLedgerSpec extends SparkSpec {

  test("every query's exchange counts match the checked-in ledger") {
    val path = java.nio.file.Paths.get("/root/repo/EXCHANGES.txt")
    assert(java.nio.file.Files.exists(path),
      "EXCHANGES.txt missing — generate it with " +
        "`runMain graft.PlanScan exchanges /root/testdata/sf0.001 EXCHANGES.txt`")
    val recorded = scala.jdk.CollectionConverters
      .ListHasAsScala(java.nio.file.Files.readAllLines(path)).asScala
      .filter(_.nonEmpty)
      .map { l => val p = l.split(" ", 2); p(0) -> p(1) }
      .toMap
    val current = PlanScan.exchangeLedgerLines(spark, sfDir)
      .map { l => val p = l.split(" ", 2); p(0) -> p(1) }
    val names = current.map(_._1)
    val missing = names.filterNot(recorded.contains)
    val removed = (recorded.keySet -- names).toSeq.sorted
    val changed = current.collect {
      case (n, c) if recorded.contains(n) && recorded(n) != c =>
        s"$n: recorded '${recorded(n)}' vs current '$c'"
    }
    val problems =
      missing.map(n => s"$n: not in ledger (new query? regenerate)") ++
        removed.map(n => s"$n: in ledger but gone from the surface") ++
        changed
    assert(problems.isEmpty,
      s"${problems.size} exchange-ledger divergences:\n" +
        problems.mkString("\n"))
  }
}
