package graft

/** Partitioning-independence sweep: every query's RESULT VALUES must
  * be identical under different shuffle widths — the engine's core
  * determinism claim (the DuckDB oracle compares one run; this pins
  * that no query's output depends on how rows happened to land in
  * partitions: no rand(), no first()-without-order, no
  * partial-ordered LIMIT).
  *
  * A rotating ~20-query sample (the HarnessParitySpec discipline —
  * executing all ~285 twice per `sbt test` is too slow; the rotation
  * covers the surface across rounds), each executed in two child
  * sessions of the shared context with shuffle.partitions 4 vs 7 —
  * different widths reshuffle row orders and partial-aggregation
  * groupings, so anything partition-dependent diverges.
  */
class DeterminismSpec extends SparkSpec {

  private def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  test("a rotating ~20-query sample returns identical values under " +
    "shuffle widths 4 and 7") {
    val s4 = spark.newSession()
    val s7 = spark.newSession()
    s4.conf.set("spark.sql.shuffle.partitions", "4")
    s7.conf.set("spark.sql.shuffle.partitions", "7")
    // offset the rotation from HarnessParitySpec's seed so the two
    // sweeps cover different queries in the same round
    val round = Option(new java.io.File("/root/repo").listFiles())
      .map(_.count(_.getName.matches("CORRECTNESS_r\\d+\\.json")))
      .getOrElse(0)
    val names = SparkEntry.allQueries.map(_.name).sorted
    val sample = new scala.util.Random(round.toLong + 1000L)
      .shuffle(names).take(20)
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
    assert(failures.isEmpty,
      s"round-$round sample: ${failures.size} queries are " +
        s"partition-dependent:\n${failures.mkString("\n")}")
  }
}
