package graft

/** Overlap INDEPENDENT Spark actions from driver threads (optimization
  * guide §2.6): actions are only sequential because the driver calls
  * them sequentially, and at bench scale most stages leave cores idle
  * (few non-empty input splits), so the next job's tasks back-fill the
  * scheduler gaps and stage tails of the current one. Used by the
  * multi-band gate queries (t29/t31/t32) whose bands are separate
  * aggregations with no data dependency; jobs submitted concurrently
  * over one SHARED cached frame are safe — block materialization is
  * per-partition locked in the BlockManager, so racing consumers wait
  * on, not duplicate, each partition's compute.
  */
object Par {

  /** Run the thunks as concurrent jobs; returns results in order.
    * The first failure propagates (same contract as running them
    * sequentially — Bench charges the elapsed time either way).
    */
  def jobs[T](thunks: (() => T)*): Seq[T] = {
    if (thunks.lengthCompare(2) < 0) return thunks.map(_()).toSeq
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.length)
    try {
      import scala.concurrent.duration.Duration
      import scala.concurrent.{Await, ExecutionContext, Future}
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val fs = thunks.map(t => Future(t())).toSeq
      fs.map(Await.result(_, Duration.Inf))
    } finally pool.shutdown()
  }
}
