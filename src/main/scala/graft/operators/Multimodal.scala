package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training pipelines: image/audio/video
  * as opaque `binary` columns with typed metadata, plus the transform
  * stages (decode → feature-extract → frame-sample) as real Spark
  * plans.
  *
  * The actual byte decoding is STUBBED (this container has no image/
  * audio codecs): [[decodeFeaturesStub]] derives a deterministic fake
  * feature vector from the bytes. Everything around it — schema, batch
  * shape, partitioning, the explode-based frame sampler — is the real
  * pipeline; swap the stub for a `mapPartitions` (JVM codec) or
  * `mapInPandas`/`mapInArrow` (Python codec) stage with the same
  * (bytes → Array[Float]) contract and nothing else changes. */
object Multimodal {

  /** Canonical media table schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("format", StringType))))))

  /** Deterministic synthetic media frame for tests/demos: payload bytes
    * derived from the id (stands in for real files on object storage). */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).select(
      col("id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("id") % 3 + 1).cast("int")).as("media_type"),
      sha2(col("id").cast("string"), 256).cast("binary").as("bytes"),
      struct(
        (col("id") % 1920 + 1).cast("int").as("width"),
        (col("id") % 1080 + 1).cast("int").as("height"),
        (col("id") * 7919 % 60000 + 1000).as("duration_ms"),
        lit("synthetic").as("format")).as("meta"))
  }

  /** ??? — real decode goes here. STUB: deterministic pseudo-features
    * from the payload hash, `dim` floats in [-1, 1]. Real impl: a
    * `mapPartitions` stage holding a per-partition codec handle (JVM),
    * or `mapInArrow` batching ~1k rows to a Python worker; identical
    * (bytes → Array[Float]) contract, same downstream plan. */
  def decodeFeaturesStub(dim: Int)(bytesCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(bytesCol, i), lit(2000L)).cast("double") / 1000.0) - 1.0)

  /** Resize plumbing: metadata transform only (the byte transform is
    * part of the stubbed codec stage). */
  def resizeMeta(df: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide) / col("meta.width"), lit(maxSide) / col("meta.height"), lit(1.0))
    df.withColumn("meta", struct(
      ceil(col("meta.width") * scale).cast("int").as("width"),
      ceil(col("meta.height") * scale).cast("int").as("height"),
      col("meta.duration_ms").as("duration_ms"),
      col("meta.format").as("format")))
  }

  /** Frame sampling for video rows: one output row per sampled
    * timestamp (explode of a sequence — distributes, no driver loop). */
  def frameSample(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("media_type") === "video")
      .withColumn("frame_ts_ms",
        explode(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs))))
      .select(col("media_id"), col("frame_ts_ms"), col("bytes"), col("meta"))

  /** Full feature-extraction stage: decode stub → feature column,
    * repartitioned for downstream ANN (bucket-friendly layout). */
  def extractFeatures(df: DataFrame, dim: Int, partitions: Int): DataFrame =
    df.repartition(partitions, col("media_id"))
      .withColumn("features", decodeFeaturesStub(dim)(col("bytes")))
      .select(col("media_id"), col("media_type"), col("features"))
}
