package graft


/** Dev tool: sweep every query's optimized plan and count occurrences
  * of expensive expression markers — a duplicated `split(`/`md5(`
  * inside one plan usually means a filter/projection recompute trap.
  */
object PlanScan {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("broadcast")) return broadcastAudit(args)
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

  /** `runMain graft.PlanScan broadcast [sfDir]`: flag every
    * BroadcastExchange whose input carries a per-row corpus key
    * (doc_id/text/embedding/event_id/l_orderkey) — the q218 failure
    * class, where the planner broadcasts the corpus-sized stream
    * instead of the bounded model/dimension. Hits need eyeballing
    * (a top-k or probe-set broadcast legitimately keeps doc_id), but
    * every scale-fatal direction mistake surfaces here.
    */
  private def broadcastAudit(args: Array[String]): Unit = {
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.Sessions.local("4", logLevel = "ERROR")
    val corpusKeys = Seq("doc_id#", "text#", "embedding#", "event_id#",
      "l_orderkey#")
    SparkEntry.allQueries.sortBy(_.name).foreach { q =>
      try {
        val sections = q.run(spark, sfDir).queryExecution
          .explainString(org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
          .split("\n\n")
        sections.filter(_.startsWith("(")).foreach { s =>
          val head = s.linesIterator.next()
          if (head.contains("BroadcastExchange")) {
            val keys = corpusKeys.filter(s.contains)
            if (keys.nonEmpty)
              println(s"[bcast] ${q.name}: ${keys.mkString(",")} " +
                s"in $head")
          }
        }
      } catch {
        case e: Throwable =>
          println(s"[bcast] ${q.name} FAILED: ${e.getMessage.take(100)}")
      }
    }
    spark.stop()
  }
}
