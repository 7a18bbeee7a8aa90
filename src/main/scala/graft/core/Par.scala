package graft.core

/** Overlap independent eager stages from the driver (optimization
  * guide §2.6 "overlap independent jobs"): Spark happily runs several
  * jobs at once inside one application — multi-stage query bodies
  * whose `localCheckpoint()` barriers are independent of each other
  * only serialize because the driver calls them sequentially.
  * Results are deterministic: each thunk builds the same DataFrame it
  * would have built sequentially; only the JOB SCHEDULE overlaps.
  *
  * Two thunks is deliberate — enough to fill the tail of one chain
  * with the other's work on local[32], not so many that tiny stages
  * fight for task slots (the guide's own "2-3 jobs in flight is
  * plenty").
  */
object Par {

  /** Evaluate `a` and `b` concurrently, return both. Exceptions from
    * either thunk propagate to the caller (after both settle).
    */
  def join2[A, B](a: => A, b: => B): (A, B) = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val fa = scala.concurrent.Future(a)
      val fb = scala.concurrent.Future(b)
      val ra = scala.concurrent.Await.result(fa,
        scala.concurrent.duration.Duration.Inf)
      val rb = scala.concurrent.Await.result(fb,
        scala.concurrent.duration.Duration.Inf)
      (ra, rb)
    } finally pool.shutdown()
  }

  /** Start `a` on a background thread NOW; the returned thunk blocks
    * until the result is ready. For the "one stage input is
    * independent of the whole chain" shape (q307's benchmark gram
    * set): kick the build off before stage 1, collect it where the
    * consuming stage needs it.
    */
  def bg[A](a: => A): () => A = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(1)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val f = scala.concurrent.Future(a)
    () =>
      try scala.concurrent.Await.result(f,
        scala.concurrent.duration.Duration.Inf)
      finally pool.shutdown()
  }
}
