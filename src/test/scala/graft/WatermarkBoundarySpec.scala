package graft

import org.apache.spark.sql.functions._

/** Pins Spark's append-mode finalization boundaries at MILLISECOND
  * watermark resolution — the exact inequalities the s01/s03 DuckDB
  * oracles encode. If a Spark upgrade shifts either boundary, these
  * fail before the driver gates do.
  *
  *  - windowed aggregation EVICTS (emits) a window when
  *    `window_end <= watermark` (NON-strict);
  *  - an event-time TIMEOUT fires only when
  *    `watermark > timeout` (STRICT), and SessionStream registers the
  *    timeout as ceil-to-millis of the micro deadline.
  *
  * The watermark itself is floor-to-millis of the max event time minus
  * the delay; Spark evaluates both predicates in the batch AFTER the
  * one that advanced the watermark. */
class WatermarkBoundarySpec extends SparkTestBase {
  import spark.implicits._

  test("window eviction is non-strict: emits when watermark == window end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.IngestStream
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    def t(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)
    val agg = IngestStream.windowedEventCounts(
      mem.toDF().toDF("ts", "event_type", "value"),
      watermark = "10 seconds", window_ = "10 seconds")
    val q = agg.writeStream.format("memory").queryName("wm_win")
      .outputMode("append").start()
    try {
      mem.addData((t(0), "a", 1.0)) // window ends at base+10_000 ms
      q.processAllAvailable()
      mem.addData((t(20000), "a", 1.0)) // watermark -> exactly base+10_000
      q.processAllAvailable()
      mem.addData((t(20000), "a", 1.0)) // eviction batch at wm == end
      q.processAllAvailable()
      assert(spark.table("wm_win").count() > 0,
        "window whose end EQUALS the watermark must be emitted (<= eviction)")
    } finally q.stop()
  }

  test("session timeout is strict: fires only when watermark passes the deadline") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.SessionStream
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    def t(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)
    val sessions = SessionStream.sessionize(
      mem.toDF().toDF("user_id", "ts"), gapMs = 10000L, watermark = "10 seconds")
    val q = sessions.writeStream.format("memory").queryName("wm_sess")
      .outputMode("append").start()
    def emitted = spark.table("wm_sess").select("user_id").as[Long].collect().toSet
    try {
      mem.addData((1L, t(0))) // tail deadline = base+10_000 ms
      q.processAllAvailable()
      mem.addData((2L, t(20000))) // watermark -> exactly base+10_000
      q.processAllAvailable()
      mem.addData((2L, t(20000))) // timeout batch at wm == deadline
      q.processAllAvailable()
      assert(!emitted.contains(1L),
        "timeout at wm == deadline must NOT fire (strict >)")
      mem.addData((3L, t(20002))) // watermark -> base+10_002
      q.processAllAvailable()
      mem.addData((3L, t(20002))) // timeout batch at wm > deadline
      q.processAllAvailable()
      assert(emitted.contains(1L),
        "timeout must fire once the watermark strictly passes the deadline")
    } finally q.stop()
  }

  test("interval join: in-window pairs emit, late rows beyond the watermark drop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.IngestStream
    implicit val sc = spark.sqlContext
    val lm = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val rm = MemoryStream[(Long, java.sql.Timestamp, Long)]
    def t(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)
    val joined = IngestStream.intervalJoin(
      lm.toDF().toDF("l_user", "l_ts", "l_id"),
      rm.toDF().toDF("r_user", "r_ts", "r_id"),
      "l_user", "r_user", "l_ts", "r_ts",
      watermark = "10 seconds", lowerMs = 0L, upperMs = 5000L)
    val q = joined.writeStream.format("memory").queryName("wm_join")
      .outputMode("append").start()
    def pairs = spark.table("wm_join").select("l_id", "r_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      // in-interval pair joins; out-of-interval (6 s gap > 5 s) must not
      lm.addData((1L, t(0), 10L), (2L, t(0), 20L))
      rm.addData((1L, t(3000), 11L), (2L, t(6000), 21L))
      q.processAllAvailable()
      assert(pairs === Set((10L, 11L)),
        "only the pair inside [ts, ts+5s] may join")
      // advance both watermarks far past the horizon, THEN replay a
      // left row whose join window is fully behind the watermark: the
      // late row must be dropped, not joined against buffered state
      lm.addData((9L, t(60000), 90L)); rm.addData((9L, t(60000), 91L))
      q.processAllAvailable()
      lm.addData((2L, t(1000), 22L)) // would match r_id=21 if admitted
      q.processAllAvailable()
      q.processAllAvailable()
      assert(!pairs.contains((22L, 21L)),
        "a left row entirely behind the watermark must be dropped")
    } finally q.stop()
  }
}
