package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided TPC-H-ish testdata (TESTDATA.md).
  *
  * Reads are plain parquet scans so Catalyst can push filters/prune
  * columns into the scan (verify with `.explain`: `PushedFilters`,
  * `ReadSchema`). At 100 TB these would be partitioned/bucketed Delta or
  * parquet datasets; the loader API is path-based so that swap is local.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // `spark.read.parquet` performs file listing + footer/schema read on
  // every call — measurable per-query planning overhead when a pattern
  // query touches 5+ tables. A DataFrame is an immutable logical plan,
  // so reuse per (session, path) is safe; the underlying testdata is
  // static (a live deployment would swap this for catalog tables whose
  // file index Spark already caches). Entries whose session has been
  // stopped are purged on every access, so repeated session creation
  // (tests) cannot accumulate dead sessions/plans; callers that rewrite
  // files under a reused path must invalidate().
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    cache.keySet.removeIf(_._1.sparkContext.isStopped)
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"),
      k => k._1.read.parquet(k._2))
  }

  /** Drop cached plans (tests that rewrite files under a reused dir). */
  def invalidate(): Unit = cache.clear()

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** events.parquet stores `ts` as TIMESTAMP(NANOS); Spark reads it as
    * LongType under spark.sql.legacy.parquet.nanosAsLong (set in every
    * session builder here) — normalize back to a (microsecond)
    * TimestampType column for uniform downstream semantics. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(apply(s, d, "events"))

  /** Shared by the batch loader and the streaming gates (the stream
    * reads the same file with the same nanosAsLong schema). */
  def normalizeTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            (org.apache.spark.sql.functions.col("ts") / 1000L)
              .cast(org.apache.spark.sql.types.LongType)))
      case _ => raw
    }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
