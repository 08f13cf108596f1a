package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.storage.GraphStore

/** Ingestion as Structured Streaming (SURVEY.md §2.9): the reference's
  * Dagster-sensor-triggered batch DAG (dagster/sensors/sec.py →
  * 4-asset pipeline, dagster/assets/sec.py) becomes a file-source
  * stream with `Trigger.AvailableNow` — "process everything that has
  * arrived, then stop", the idiomatic sensor replacement — and a
  * `foreachBatch` sink running the same dedup ingest as the batch path.
  *
  * The watermarked event-time aggregation is the extension point the
  * reference lacks (its streaming is chunked *result* streaming only):
  * at 100 TB the events feed runs continuously with
  * `Trigger.ProcessingTime`, and state is bounded by the watermark. */
object IngestStream {

  /** Watch a directory of parquet drops for a node table; each
    * micro-batch runs the store's dedup ingest (ignore-errors mode, so
    * replayed files can't duplicate keys — exactly-once effect on top
    * of at-least-once file delivery). */
  def nodeIngest(
      store: GraphStore, label: String, watchDir: String,
      checkpoint: String): StreamingQuery = {
    val schema = store.schema.node(label).structType
    store.spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 64) // bound batch size at scale
      .parquet(watchDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.ingestNodes(label, batch, Some(s"stream-$batchId"),
          ignoreErrors = true): Unit
      }
      .start()
  }

  /** Normalize an event-time column to TIMESTAMP before `withWatermark`:
    * parquet written with `isAdjustedToUTC=false` (our testdata, and any
    * NTZ-producing writer) infers as TIMESTAMP_NTZ, which
    * `withWatermark` rejects (`EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`).
    * Under the UTC session timezone (SparkBoot) the cast is
    * value-identity; a no-op when the column is already TIMESTAMP. */
  private[streaming] def asEventTime(df: DataFrame, tsCol: String): DataFrame =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType => df
      case _ => df.withColumn(tsCol, col(tsCol).cast("timestamp"))
    }

  /** Watermarked tumbling-window aggregation over an event stream —
    * the §2.9 extension. Late rows beyond the watermark are dropped;
    * state size is O(windows in flight), not O(stream). */
  def windowedEventCounts(
      events: DataFrame, // streaming frame with ts/event_type/value
      watermark: String = "10 minutes",
      window_ : String = "5 minutes"): DataFrame =
    asEventTime(events, "ts")
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Open the events table shape as a file-source stream. */
  def eventStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Streaming exact dedup: first occurrence of each key wins, with
    * state bounded by the watermark (`dropDuplicatesWithinWatermark` —
    * keys older than the watermark are forgotten, so replayed/late
    * duplicates inside the window are dropped while state stays
    * O(keys per window), never O(stream)). The streaming face of
    * `Dedup.exactDedup` for at-least-once ingest feeds. */
  def dedupStream(
      events: DataFrame, keyCols: Seq[String], tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    asEventTime(events, tsCol).withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Watermarked stream-stream INNER interval join: correlate two
    * event feeds on a key within a bounded event-time interval
    * (`rightTs ∈ [leftTs + lowerMs, leftTs + upperMs]`) — the
    * click→purchase attribution shape. Both sides carry watermarks AND
    * the join condition bounds the two event times relative to each
    * other; together those let the state store evict a buffered row as
    * soon as the other side's watermark passes its join horizon —
    * state is O(events per watermark+interval window) per side, never
    * O(stream). Inner-join emission is never withheld by the
    * watermark (only OUTER joins delay for the null-padding decision),
    * so on a complete feed the result equals the batch join — which is
    * exactly what the s04 driver oracle replays.
    *
    * Caller contract: column names across `left` and `right` must be
    * disjoint (rename before calling — Spark's stream-stream join has
    * no Seq-of-names disambiguation). */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      watermark: String, lowerMs: Long, upperMs: Long): DataFrame = {
    require(lowerMs <= upperMs, "interval lower bound must be <= upper bound")
    val l = asEventTime(left, leftTs).withWatermark(leftTs, watermark)
    val r = asEventTime(right, rightTs).withWatermark(rightTs, watermark)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) + expr(s"INTERVAL $lowerMs MILLISECOND") &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $upperMs MILLISECOND"))
  }
}
