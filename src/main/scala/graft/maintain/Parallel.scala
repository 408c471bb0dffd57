package graft.maintain

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Driver-side concurrent submission of independent Spark jobs (bins/groups
  * are independent by construction). Spark schedules the concurrently
  * submitted jobs across the same executors, so many single-partition bin
  * rewrites fill the cluster instead of running one task at a time — the
  * difference between compaction that scales with cores and compaction
  * whose wall-clock is bins x per-job latency regardless of cluster size.
  */
object Parallel {
  def mapInParallel[A, B](items: Vector[A], parallelism: Int)(f: A => B): Vector[B] = {
    if (items.size <= 1 || parallelism <= 1) return items.map(f)
    val pool = Executors.newFixedThreadPool(math.min(parallelism, items.size))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try Await.result(Future.sequence(items.map(a => Future(f(a)))), Duration.Inf)
    finally pool.shutdown()
  }
}
