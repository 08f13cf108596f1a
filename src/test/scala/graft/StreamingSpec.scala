package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.schema.RoboledgerSchema
import graft.storage.GraphStore
import graft.streaming.IngestStream

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("AvailableNow file-source ingest lands deduped rows in the store") {
    val tmp = Files.createTempDirectory("graft-stream").toString
    val watch = s"$tmp/drops"; new java.io.File(watch).mkdirs()
    val store = new GraphStore(spark, s"$tmp/graph", "g1", RoboledgerSchema.schema)

    // two drops with an overlapping key: stream must dedup via
    // ignore-errors ingest
    store.conform(Seq(("e1", "Acme"), ("e2", "Globex")).toDF("identifier", "name"),
      store.schema.node("Entity").structType)
      .coalesce(1).write.parquet(s"$watch/drop1")
    store.conform(Seq(("e2", "Globex Again"), ("e3", "Initech")).toDF("identifier", "name"),
      store.schema.node("Entity").structType)
      .coalesce(1).write.parquet(s"$watch/drop2")

    val q = IngestStream.nodeIngest(store, "Entity", s"$watch/*/", s"$tmp/ckpt")
    q.awaitTermination(60000)
    assert(store.node("Entity").count() === 3)
    assert(store.node("Entity").select("identifier").as[String].collect().sorted
      === Array("e1", "e2", "e3"))
  }

  test("flatMapGroupsWithState sessionizer: in-batch gap closure + watermark timeout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.SessionStream
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    val sessions = SessionStream.sessionize(
      mem.toDF().toDF("user_id", "ts"), gapMs = 10000L, watermark = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // user 3's two events are 50 s apart IN ONE BATCH: first session
      // closes immediately; user 1's two events chain into one open one
      mem.addData((1L, t(0)), (1L, t(5)), (3L, t(0)), (3L, t(50)))
      q.processAllAvailable()
      // advance the watermark past user 1's last-event + gap (15 s):
      // batch N computes timeouts against the watermark from batch N-1,
      // so one more batch is needed after the advancing one
      mem.addData((2L, t(100)))
      q.processAllAvailable()
      mem.addData((2L, t(101)))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select("user_id", "n_events").as[(Long, Long)].collect().toSet
      assert(rows.contains((3L, 1L)), s"in-batch gap closure missing: $rows")
      assert(rows.contains((1L, 2L)), s"watermark timeout session missing: $rows")
    } finally q.stop()
  }

  test("sessionizer: late cross-batch event cannot regress or corrupt the open session") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.SessionStream
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    val sessions = SessionStream.sessionize(
      mem.toDF().toDF("user_id", "ts"), gapMs = 10000L, watermark = "2 minutes")
    val q = sessions.writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      mem.addData((1L, t(100)))
      q.processAllAvailable()
      // 60 s late, far outside the open session's gap: must emit as a
      // standalone fragment, NOT merge backward (the pre-fix bug made
      // -60 <= gap pass and dragged lastMs to 40)
      mem.addData((1L, t(40)))
      q.processAllAvailable()
      mem.addData((9L, t(235)))
      q.processAllAvailable()
      mem.addData((9L, t(236)))
      q.processAllAvailable()
      val rows = spark.table("sess_late")
        .select("user_id", "session_start", "session_end", "n_events")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect()
      val u1 = rows.filter(_._1 == 1L).sortBy(_._2.getTime)
      assert(u1.map(r => (r._2, r._3, r._4)).toSeq ===
        Seq((t(40), t(40), 1L), (t(100), t(100), 1L)), s"got ${u1.toSeq}")
      assert(rows.forall(r => !r._3.before(r._2)), "session_end must be >= start")
    } finally q.stop()
  }

  test("sessionizer: late events near each other merge into ONE fragment") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.SessionStream
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    val sessions = SessionStream.sessionize(
      mem.toDF().toDF("user_id", "ts"), gapMs = 10000L, watermark = "3 minutes")
    val q = sessions.writeStream.format("memory").queryName("sess_frag")
      .outputMode("append").start()
    try {
      mem.addData((1L, t(100)))
      q.processAllAvailable()
      // two late events 5 s apart: one (40-45, n=2) fragment, not two
      // singletons (the pre-fix per-event loop emitted each alone)
      mem.addData((1L, t(40)), (1L, t(45)))
      q.processAllAvailable()
      val rows = spark.table("sess_frag")
        .select("session_start", "session_end", "n_events")
        .as[(java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSeq
      assert(rows === Seq((t(40), t(45), 2L)), s"got $rows")
    } finally q.stop()
  }

  test("sessionize rejects batch frames loudly") {
    import spark.implicits._
    val batch = Seq((1L, new java.sql.Timestamp(0L))).toDF("user_id", "ts")
    val e = intercept[IllegalArgumentException] {
      graft.streaming.SessionStream.sessionize(batch, gapMs = 1000L)
    }
    assert(e.getMessage.contains("streaming"))
  }

  test("streaming dedup drops in-window duplicates across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    val deduped = IngestStream.dedupStream(
      mem.toDF().toDF("event_id", "ts"), Seq("event_id"), "ts", "1 minute")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, t(0)), (2L, t(1)), (1L, t(2))) // in-batch dup
      q.processAllAvailable()
      mem.addData((2L, t(3)), (3L, t(4))) // cross-batch dup within window
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("watermarked windowed aggregation over a file event stream") {
    val tmp = Files.createTempDirectory("graft-events").toString
    val src0 = graft.sources.Tables.events(spark, sfDir).limit(500)
    src0.write.parquet(s"$tmp/in")
    val inferred = spark.read.parquet(s"$tmp/in").schema
    // NTZ regression pin: the testdata events `ts` round-trips through
    // parquet as TIMESTAMP_NTZ; windowedEventCounts must accept it
    // (withWatermark alone would throw EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).
    assert(inferred("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType,
      s"expected NTZ ts in parquet round-trip, got ${inferred("ts").dataType}")
    val src = src0.withColumn("ts", col("ts").cast("timestamp"))
    val stream = IngestStream.eventStream(spark, s"$tmp/in", inferred)
    val agg = IngestStream.windowedEventCounts(stream, "10 minutes", "5 minutes")
    val q = agg.writeStream
      .format("memory").queryName("winagg")
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    // append mode emits only watermark-closed windows; with a finite
    // file source the final window may stay open — compare the closed
    // prefix against the batch computation.
    val got = spark.table("winagg")
    val batch = src
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))
    val gotSet = got.select("window_start", "event_type", "n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val batchSet = batch.as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(gotSet.nonEmpty)
    assert(gotSet.subsetOf(batchSet))
  }
}
