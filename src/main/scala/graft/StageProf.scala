package graft

import scala.collection.mutable

/** Dev-only per-stage profiler (guide §7.1 without the UI): runs a
  * named query with a SparkListener capturing every stage's wall
  * time, task count, and shuffle/input volumes, then prints stages
  * sorted by duration with the head of their callsite — the
  * empirical "which operator owns the time" answer TimeQ's
  * end-to-end number can't give. Not part of the driver contract.
  *
  * `runMain graft.StageProf <sfDir> <query> [passes]`
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("32", logLevel = "ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val q = args.lift(1).getOrElse("q1_agg")
    val passes = args.lift(2).map(_.toInt).getOrElse(2)
    final case class St(id: Int, name: String, ms: Long, tasks: Int,
      inMb: Double, shrMb: Double, shwMb: Double, maxTaskMs: Long,
      maxGcMs: Long = 0, maxCpuMs: Long = 0, medTaskMs: Long = 0)
    val stages = mutable.ArrayBuffer.empty[St]
    val maxTask = mutable.Map.empty[Int, Long].withDefaultValue(0L)
    // straggler anatomy: per stage keep the longest task's GC and CPU
    // time plus the median task duration, so a maxT≈stage stage can be
    // attributed (skewed data vs GC pause vs codegen-compile-in-task)
    val maxGc = mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val maxCpu = mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val durs = mutable.Map.empty[Int, mutable.ArrayBuffer[Long]]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = te.taskInfo.duration
        durs.getOrElseUpdate(te.stageId, mutable.ArrayBuffer.empty) += d
        if (d > maxTask(te.stageId)) {
          maxTask(te.stageId) = d
          Option(te.taskMetrics).foreach { m =>
            maxGc(te.stageId) = m.jvmGCTime
            maxCpu(te.stageId) = m.executorCpuTime / 1000000L
          }
        }
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
          : Unit = {
        val i = sc.stageInfo
        val ms = (for {a <- i.completionTime; b <- i.submissionTime}
          yield a - b).getOrElse(-1L)
        val m = i.taskMetrics
        // first graft frame in the callsite stack beats the generic
        // "withThreadLocalCaptured" every AQE-materialized stage gets
        val site = (i.name.linesIterator.take(1).toSeq ++
          i.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("StageProf")))
          .mkString(" | ").trim
        val ds = durs.getOrElse(i.stageId,
          mutable.ArrayBuffer.empty[Long]).sorted
        stages += St(i.stageId, site, ms, i.numTasks,
          m.inputMetrics.bytesRead / 1e6,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          maxTask(i.stageId), maxGc(i.stageId), maxCpu(i.stageId),
          if (ds.nonEmpty) ds(ds.size / 2) else 0L)
      }
    }
    val fn = SparkEntry.benchQueries(q)
    // warm pass (codegen+JIT), then measured passes
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    spark.sparkContext.addSparkListener(listener)
    for (p <- 1 to passes) {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[prof] $q pass$p total ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(300)
    val byStage = stages.sortBy(-_.ms)
    val total = stages.map(_.ms).sum
    println(f"[prof] stage-time sum ${total / 1e3}%.3f s over " +
      f"${stages.size} stages, ${stages.map(_.tasks).sum} tasks " +
      f"(across $passes passes)")
    byStage.take(40).foreach { s =>
      println(f"[prof] ${s.ms}%6d ms  ${s.tasks}%4d tasks  " +
        f"maxT=${s.maxTaskMs}%5d medT=${s.medTaskMs}%5d " +
        f"gc=${s.maxGcMs}%4d cpu=${s.maxCpuMs}%5d  " +
        f"in=${s.inMb}%7.1f  sr=${s.shrMb}%7.1f  sw=${s.shwMb}%7.1f  " +
        s"#${s.id} ${s.name.linesIterator.next().take(90)}")
    }
    spark.stop()
  }
}
