package graft.serve

import java.util.concurrent.{Executors, TimeUnit, TimeoutException}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Query timeouts via Spark job groups (the engine-level `CALL
  * timeout=<ms>` of robosystems/graph_api/core/ladybug/engine.py:96-108
  * and the 60 s default / 300 s max request timeout of
  * models/api/graphs/query.py:29,146-150). The action runs in a worker
  * thread tagged with a job group; on deadline the group's Spark jobs
  * are cancelled — tasks stop promptly, not just the await. */
object QueryTimeout {

  val DefaultTimeoutMs = 60000L
  val MaxTimeoutMs = 300000L

  private val pool = Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "graft-timeout-runner"); t.setDaemon(true); t
  })

  /** Collect with a deadline; throws TimeoutException after cancelling
    * the query's Spark jobs. */
  def collectWithTimeout(
      spark: SparkSession, df: DataFrame,
      timeoutMs: Long = DefaultTimeoutMs): Array[Row] = {
    require(timeoutMs > 0 && timeoutMs <= MaxTimeoutMs,
      s"timeout must be in (0, $MaxTimeoutMs] ms")
    val group = s"graft-q-${System.nanoTime()}"
    val fut = pool.submit(() => {
      spark.sparkContext.setJobGroup(group, "graft timed query",
        interruptOnCancel = true)
      try df.collect()
      finally spark.sparkContext.clearJobGroup()
    })
    try fut.get(timeoutMs, TimeUnit.MILLISECONDS)
    catch {
      case e: TimeoutException =>
        spark.sparkContext.cancelJobGroup(group)
        fut.cancel(true)
        throw new TimeoutException(s"query exceeded ${timeoutMs} ms (jobs cancelled)")
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    }
  }
}
