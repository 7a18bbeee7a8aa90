package graft
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("8", logLevel = "ERROR")
    args.foreach { n =>
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
      println(s"===== $n =====")
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      val p = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case o => o
      }
      println(p.toString.linesIterator.map(_.take(160)).mkString("\n"))
    }
    spark.stop()
  }
}
