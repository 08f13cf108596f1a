package graft.serve

import java.util.concurrent._
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}
import scala.collection.concurrent.TrieMap

/** Priority query queue with admission control, ported from the
  * reference's engine-independent design:
  *
  *  - max-heap on (−priority, createdAt) —
  *    robosystems/middleware/graph/query_queue.py:243-244;
  *  - `maxConcurrent` running queries (default 50, query_queue.py:84),
  *    bounded queue size, per-user caps;
  *  - admission pressure score accept/queue/reject —
  *    middleware/graph/admission_control.py:90,251;
  *  - status/cancel (query_queue.py:262,342).
  *
  * On Spark the "executor" is the driver thread that triggers an
  * action; long queries are cancelable via job groups
  * (`sparkContext.cancelJobGroup`), which is how [[cancel]] reaches an
  * already-running query. */
final class QueryQueue(
    maxConcurrent: Int = 50,
    maxQueueSize: Int = 10000,
    maxPerUser: Int = 100,
    /** finished entries retained for status/result lookup; older ones
      * are evicted (unbounded retention of Array[Row] results would
      * grow the driver heap monotonically) */
    maxFinishedRetained: Int = 1000) {

  sealed trait Status
  object Status {
    case object Queued extends Status
    case object Running extends Status
    case object Completed extends Status
    case object Failed extends Status
    case object Cancelled extends Status
  }

  final case class Submission(
      id: Long, userId: String, priority: Int, createdAt: Long,
      run: () => Any)

  private val idGen = new AtomicLong(0)
  private val queue = new PriorityBlockingQueue[Submission](64,
    Ordering.by[Submission, (Int, Long)](s => (-s.priority, s.createdAt)))
  private val status = TrieMap.empty[Long, Status]
  private val results = TrieMap.empty[Long, Any]
  private val errors = TrieMap.empty[Long, Throwable]
  private val cancelled = TrieMap.empty[Long, AtomicBoolean]
  private val perUser = TrieMap.empty[String, AtomicLong]
  private val finished = new ConcurrentLinkedQueue[Long]()
  @volatile private var stopped = false

  private def recordFinished(id: Long): Unit = {
    finished.add(id)
    while (finished.size > maxFinishedRetained) {
      val old = finished.poll()
      if (old != 0L) {
        status.remove(old); results.remove(old)
        errors.remove(old); cancelled.remove(old)
      }
    }
  }

  private val workers = {
    // exactly maxConcurrent workers, each pulling only when free to
    // run: pool size IS the concurrency bound, and nothing is dequeued
    // ahead of execution (a dequeue-then-wait design inverts priority —
    // a low-priority query parked in a blocked worker runs before a
    // higher-priority one still in the heap)
    val nWorkers = math.max(1, maxConcurrent)
    val pool = Executors.newFixedThreadPool(nWorkers,
      r => { val t = new Thread(r, "graft-query-worker"); t.setDaemon(true); t })
    (1 to nWorkers).foreach(_ => pool.submit(new Runnable {
      def run(): Unit = while (!stopped) {
        val s = queue.poll(100, TimeUnit.MILLISECONDS)
        if (s != null) {
          try {
            if (cancelled(s.id).get()) status.update(s.id, Status.Cancelled)
            else {
              status.update(s.id, Status.Running)
              try { results.update(s.id, s.run()); status.update(s.id, Status.Completed) }
              catch { case t: Throwable =>
                errors.update(s.id, t); status.update(s.id, Status.Failed)
              }
            }
          } finally {
            recordFinished(s.id)
            perUser.get(s.userId).foreach(_.decrementAndGet())
          }
        }
      }
    }))
    pool
  }

  /** Admission decision from load pressure (admission_control.py:251
    * _calculate_pressure_score shape: weighted cpu/mem/queue). */
  def pressureScore(cpu: Double, mem: Double): Double = {
    val queuePressure = queue.size.toDouble / maxQueueSize
    0.4 * cpu + 0.4 * mem + 0.2 * queuePressure
  }

  sealed trait Admission
  object Admission {
    case object Accept extends Admission
    case object Reject extends Admission
  }

  def checkAdmission(cpu: Double = 0.0, mem: Double = 0.0): Admission =
    if (pressureScore(cpu, mem) > 0.95 || queue.size >= maxQueueSize)
      Admission.Reject
    else Admission.Accept

  /** Submit; returns the query id, or Left on per-user/queue limits. */
  def submit(userId: String, priority: Int = 0)(run: => Any): Either[String, Long] = {
    val userCount = perUser.getOrElseUpdate(userId, new AtomicLong(0))
    if (userCount.get() >= maxPerUser) Left(s"user $userId exceeds $maxPerUser queued queries")
    else if (queue.size >= maxQueueSize) Left("queue full")
    else {
      val id = idGen.incrementAndGet()
      userCount.incrementAndGet()
      cancelled.update(id, new AtomicBoolean(false))
      status.update(id, Status.Queued)
      queue.put(Submission(id, userId, priority, System.nanoTime(), () => run))
      Right(id)
    }
  }

  def statusOf(id: Long): Option[Status] = status.get(id)
  def resultOf(id: Long): Option[Any] = results.get(id)
  def errorOf(id: Long): Option[Throwable] = errors.get(id)

  /** Cancel a queued query (running queries additionally need their
    * Spark job group cancelled by the caller). */
  def cancel(id: Long): Boolean =
    cancelled.get(id).exists { f => f.set(true); status.get(id).contains(Status.Queued) }

  /** Await a terminal state (test/demo helper). */
  def await(id: Long, timeoutMs: Long = 30000): Status = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      status.get(id) match {
        case Some(s @ (Status.Completed | Status.Failed | Status.Cancelled)) => return s
        case _ => Thread.sleep(5)
      }
    }
    status.getOrElse(id, Status.Queued)
  }

  def shutdown(): Unit = { stopped = true; workers.shutdownNow(): Unit }
}
