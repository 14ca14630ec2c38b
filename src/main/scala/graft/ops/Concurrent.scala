package graft.ops

/** Driver-side job-chain overlap (guide §2.6, overlap independent
  * jobs): Spark's scheduler happily runs several jobs at once inside
  * one application — actions are only sequential because driver code
  * calls them sequentially. Every eager gate and store operation here
  * is a CHAIN of small jobs whose wall time is dominated by fixed
  * per-job scheduler latency, so running independent chains
  * concurrently subtracts whole chains from the critical path. */
object Concurrent {

  /** Run N independent driver-side stacks (each typically a chain of
    * small Spark jobs ending in a bounded collect) CONCURRENTLY and
    * return their results in order. All callers' stacks must be
    * deterministic, so results are execution-order-invariant. On any
    * stack failure the pool is shut down NOW (interrupting the
    * sibling threads' job waits) before the first failure rethrows,
    * so a failed stack does not leave its siblings' job chains
    * running behind it. */
  def collectConcurrently[T](stacks: Seq[() => T]): Seq[T] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.max(1, stacks.size))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = stacks.map(s => Future(s()))
      fs.map(Await.result(_, Duration.Inf))
    } catch {
      case t: Throwable =>
        pool.shutdownNow()
        pool.awaitTermination(30, java.util.concurrent.TimeUnit.SECONDS)
        throw t
    } finally pool.shutdown()
  }
}
