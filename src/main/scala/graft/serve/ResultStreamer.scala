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
}
