package graft.functions

import java.util.concurrent.{Callable, ExecutorService, Executors}

import org.apache.spark.sql.SparkSession

/** Overlap INDEPENDENT driver-sequenced Spark work from a small thread
  * pool (guide §2.6: actions are only sequential because driver code
  * calls them sequentially; later jobs back-fill executors freed by the
  * current job's tail).
  *
  * SAFETY CONTRACT (the r17 Change-4 lesson, `Similarity.trainPqBooks`):
  * every thunk must CONSTRUCT ITS OWN expression trees — higher-order-
  * function lambdas hold mutable `NamedLambdaVariable` state, and over
  * LocalRelation inputs the optimizer evaluates projections driver-side
  * (`ConvertToLocalRelation`) during each thread's query optimization,
  * so two threads optimizing plans that SHARE one HOF expression tree
  * race on that state and corrupt values. Passing a factory that builds
  * the frame inside the thread (fresh `transform`/`slice`/... nodes per
  * thread) removes the shared mutable state; sharing an already-analyzed
  * SOURCE dataset (a parquet scan, a cached base) underneath is fine —
  * those plans carry no lambda state and `ConvertToLocalRelation` never
  * fires on non-local sources.
  *
  * Threads run with the caller's SparkSession set active (SQLConf and
  * session state resolution are thread-local). Failures propagate: the
  * first thrown cause is rethrown on the caller thread after all tasks
  * settle, so no thread leaks past the call. */
object DriverParallel {

  def run[T](spark: SparkSession, thunks: Seq[() => T]): Seq[T] = {
    if (thunks.isEmpty) return Seq.empty
    if (thunks.size == 1) return Seq(thunks.head())
    val pool: ExecutorService = Executors.newFixedThreadPool(thunks.size)
    try {
      val futures = thunks.map { t =>
        pool.submit(new Callable[T] {
          override def call(): T = {
            SparkSession.setActiveSession(spark)
            t()
          }
        })
      }
      futures.map { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw Option(e.getCause).getOrElse(e)
        }
      }
    } finally pool.shutdown()
  }
}
