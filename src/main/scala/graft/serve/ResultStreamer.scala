package graft.serve

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Chunked result streaming (SURVEY.md §2.9): NDJSON batches of
  * `chunkSize` rows via `toLocalIterator` — rows stream from executors
  * partition-by-partition, so the driver never holds the full result
  * (robosystems/routers/graphs/query/streaming.py:74-150; default
  * chunk 1000, tier-overridable, execute.py:247-255). */
object ResultStreamer {

  val DefaultChunkSize = 1000

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    case b: Boolean => b.toString
    case d: java.lang.Double if d.isNaN || d.isInfinite => "null"
    case f: java.lang.Float if f.isNaN || f.isInfinite => "null"
    case n: java.lang.Number => n.toString
    case bytes: Array[Byte] =>
      jsonValue(java.util.Base64.getEncoder.encodeToString(bytes))
    case d: java.sql.Date => jsonValue(d.toString)
    case t: java.sql.Timestamp => jsonValue(t.toString)
    case seq: scala.collection.Seq[_] => seq.map(jsonValue).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => jsonValue(String.valueOf(k)) + ":" + jsonValue(x) }
        .mkString("{", ",", "}")
    case r: Row => rowJson(r)
    case other => jsonValue(other.toString)
  }

  private def rowJson(r: Row): String = {
    val fields = r.schema.fieldNames
    fields.indices.map(i => jsonValue(fields(i)) + ":" + jsonValue(r.get(i)))
      .mkString("{", ",", "}")
  }

  /** Lazily stream the result as NDJSON lines in `chunkSize` groups —
    * the Iterator pulls partitions incrementally. */
  def ndjsonChunks(df: DataFrame, chunkSize: Int = DefaultChunkSize): Iterator[Seq[String]] = {
    import scala.jdk.CollectionConverters._
    df.toLocalIterator().asScala.map(rowJson).grouped(chunkSize)
  }

  /** SSE-framed events: data chunks then a completion event
    * (streaming.py:236-455 event protocol shape). */
  def sseEvents(df: DataFrame, chunkSize: Int = DefaultChunkSize): Iterator[String] = {
    var sent = 0L
    val chunks = ndjsonChunks(df, chunkSize).map { c =>
      sent += c.size
      s"event: data\ndata: [${c.mkString(",")}]\n\n"
    }
    chunks ++ Iterator.single(
      s"""event: done\ndata: {"rows":$sent}\n\n""")
  }

  private def ev(name: String, payload: String): String =
    s"event: $name\ndata: $payload\n\n"

  /** SSE lifecycle events for a QUEUED execution — the reference
    * streams queued/running/progress operation events before the data
    * phase (routers/graphs/query/streaming.py:455,
    * middleware/sse/operation_manager.py); this walks the same protocol
    * off [[QueryQueue]] status:
    *
    * `queued` → `running` → `progress`(periodic while executing) →
    * `data`×N → `done`, with terminal `error` / `cancelled` variants.
    *
    * Events are produced lazily as the consumer pulls — the status
    * phase polls the queue (as the reference polls its operation
    * store), so a long-running query yields heartbeat `progress`
    * events instead of silence. A DataFrame result streams through
    * [[sseEvents]]; the action runs in the consumer's thread. */
  def sseQueuedEvents(queue: QueryQueue, id: Long,
      chunkSize: Int = DefaultChunkSize, pollMs: Long = 5,
      progressEveryMs: Long = 1000, timeoutMs: Long = 30000): Iterator[String] = {
    val head = Iterator.single(ev("queued", s"""{"id":$id}"""))
    val lifecycle: Iterator[String] = new Iterator[String] {
      private val start = System.currentTimeMillis()
      private var runningEmitted = false
      private var lastProgress = start
      private var pending: String = null
      private var tail: Iterator[String] = null

      private def dataEvents(): Iterator[String] = queue.resultOf(id) match {
        case Some(df: DataFrame) => sseEvents(df, chunkSize)
        case Some(other) =>
          Iterator(ev("data", s"[${jsonValue(other)}]"),
            ev("done", """{"rows":1}"""))
        case None => Iterator.single(ev("done", """{"rows":0}"""))
      }

      /** Poll until one event is pending or the terminal tail is set.
        * The timeout guards the QUEUED/unknown phase only — once the
        * query is Running, progress heartbeats prove liveness and a
        * legitimately long execution must not be cut into an error
        * while it keeps consuming resources. */
      private def poll(): Unit =
        while (pending == null && tail == null) {
          val now = System.currentTimeMillis()
          if (!runningEmitted && now - start > timeoutMs) {
            tail = Iterator.single(ev("error", """{"error":"timeout"}"""))
          } else queue.statusOf(id) match {
            case Some(queue.Status.Running) =>
              if (!runningEmitted) {
                runningEmitted = true
                pending = ev("running", s"""{"id":$id}""")
              } else if (now - lastProgress >= progressEveryMs) {
                lastProgress = now
                pending = ev("progress",
                  s"""{"id":$id,"elapsed_ms":${now - start}}""")
              } else Thread.sleep(pollMs)
            case Some(queue.Status.Completed) =>
              if (!runningEmitted) {
                // a fast query can jump Queued→Completed between polls;
                // the protocol still reports that it ran
                runningEmitted = true
                pending = ev("running", s"""{"id":$id}""")
              } else tail = dataEvents()
            case Some(queue.Status.Failed) =>
              val msg = queue.errorOf(id).map(_.getMessage).getOrElse("unknown")
              tail = Iterator.single(ev("error", s"""{"error":${jsonValue(msg)}}"""))
            case Some(queue.Status.Cancelled) =>
              tail = Iterator.single(ev("cancelled", s"""{"id":$id}"""))
            case None if runningEmitted =>
              // the queue's finished-entry retention evicted this id
              // before the consumer pulled its result — without a
              // terminal event here the poll loop would spin forever
              tail = Iterator.single(
                ev("error", """{"error":"result evicted before it was consumed"}"""))
            case Some(queue.Status.Queued) | None => Thread.sleep(pollMs)
          }
        }

      def hasNext: Boolean = {
        if (pending != null) return true
        if (tail == null) poll()
        pending != null || tail.hasNext
      }
      def next(): String = {
        if (!hasNext) throw new NoSuchElementException("event stream exhausted")
        if (pending != null) { val e = pending; pending = null; e }
        else tail.next()
      }
    }
    head ++ lifecycle
  }
}
