package graft


/** Dev tool: sweep every query's optimized plan and count occurrences
  * of expensive expression markers — a duplicated `split(`/`md5(`
  * inside one plan usually means a filter/projection recompute trap.
  */
object PlanScan {
  def main(args: Array[String]): Unit = {
    val sfDir =
      args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.Sessions.local("4", logLevel = "ERROR")
    val markers = Seq("split(", "md5(", "minhash_sig", "regexp_count",
      "transform(", "aggregate(", "vector_dot")
    SparkEntry.allQueries.sortBy(_.name).foreach { q =>
      try {
        val plan = q.run(spark, sfDir)
          .queryExecution.optimizedPlan.toString
        val counts = markers.map(m =>
          m -> plan.sliding(m.length).count(_ == m)).filter(_._2 > 0)
        if (counts.nonEmpty)
          println(s"[scan] ${q.name}: " +
            counts.map { case (m, c) => s"$m$c" }.mkString(" "))
      } catch {
        case e: Throwable =>
          println(s"[scan] ${q.name} FAILED: ${e.getMessage.take(100)}")
      }
    }
    spark.stop()
  }
}
