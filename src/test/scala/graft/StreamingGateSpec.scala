package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.StreamQueries
import graft.sources.Tables

/** Pins the s01–s03 streaming gates' EMISSION CONTRACT against batch
  * replicas of the same watermark semantics (the DuckDB oracles encode
  * the identical inequalities — if Spark's append-mode finalization
  * boundary ever shifts, these fail before the driver gate does). */
class StreamingGateSpec extends SparkTestBase {

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  // testdata ts is TIMESTAMP_NTZ; the streaming path casts to TIMESTAMP
  // (UTC identity) before watermarking — mirror that here
  private def batchEvents: DataFrame =
    Tables.events(spark, sfDir).withColumn("ts", col("ts").cast("timestamp"))

  test("s01: emitted windows = batch agg filtered to window_end <= max_ts - 10min") {
    val events = batchEvents
    val maxTs = events.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val wm = new java.sql.Timestamp(maxTs.getTime - 10 * 60 * 1000)
    val batch = events
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
      .filter(col("window.end") <= lit(wm))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy(col("window_start"), col("event_type"))
    val got = StreamQueries.s01StreamWindow(spark, sfDir)
    assert(got.count() > 0)
    assert(rows(got) === rows(batch))
  }

  test("s01 emission is arrival-invariant: 4 chronological micro-batches == 1 batch") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.IngestStream
    // split the events table into 4 time-ordered files (quartiles of
    // ts) so chunked arrival never makes data late: the watermark only
    // advances between batches, and each later file is strictly newer
    val tmp = Files.createTempDirectory("graft-chunks")
    val withNum = batchEvents.withColumn("ts_num", unix_micros(col("ts")))
    val cuts = withNum.stat.approxQuantile("ts_num",
      Array(0.25, 0.5, 0.75), 0.0) // exact quantiles via relativeError=0
    val bounds = (Double.NegativeInfinity +: cuts.toSeq :+ Double.PositiveInfinity)
      .sliding(2).toSeq
    bounds.zipWithIndex.foreach { case (pair, i) =>
      val (lo, hi) = (pair(0), pair(1))
      withNum.filter(col("ts_num") > lo && col("ts_num") <= hi)
        .drop("ts_num")
        .coalesce(1).write.parquet(s"$tmp/part$i")
      // one file per quartile dir → move into the watch dir with a
      // strictly increasing mtime so the file source processes them
      // oldest-first, one per micro-batch
      val f = new java.io.File(s"$tmp/part$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = Paths.get(s"$tmp/watch/chunk$i.parquet")
      Files.createDirectories(dst.getParent)
      Files.move(f.toPath, dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    val schema = spark.read.parquet(s"$tmp/watch").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/watch")
    val agg = IngestStream.windowedEventCounts(stream, "10 minutes", "5 minutes")
    val q = agg.writeStream.format("memory").queryName("chunked_s01")
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val chunked = spark.table("chunked_s01")
      .select(unix_timestamp(col("window_start")).as("window_start"),
        col("event_type"), col("n"), round(col("total_value"), 4).as("total_value"))
      .orderBy(col("window_start"), col("event_type"))
    val oneBatch = StreamQueries.s01StreamWindow(spark, sfDir)
    assert(rows(chunked) === rows(oneBatch),
      "incremental (4 micro-batch) emission must equal single-batch emission")
  }

  test("s02: emitted dedup keys = the distinct key set") {
    val got = StreamQueries.s02StreamDedup(spark, sfDir)
    val batch = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type")).distinct()
      .orderBy(col("user_id"), col("event_type"))
    assert(got.count() > 0)
    assert(rows(got) === rows(batch))
  }

  test("s03: emitted sessions = batch sessions minus watermark-held tails") {
    import org.apache.spark.sql.expressions.Window
    val events = batchEvents
    val maxUs = events.agg(max(unix_micros(col("ts")))).collect()(0).getLong(0)
    // engine-exact boundary (WatermarkBoundarySpec): ms-floor watermark,
    // ms-ceil timeout, strict firing
    val wmMs = Math.floorDiv(maxUs, 1000L) - 3600L * 1000L
    // micro-precision gap arithmetic — the sessionizer carries micros
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sessions = events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"),
        count(lit(1)).as("n_events"))
    val withLast = sessions
      .withColumn("is_last",
        col("session_idx") ===
          max(col("session_idx")).over(Window.partitionBy(col("user_id"))))
    val expected = withLast
      .filter(!(col("is_last") &&
        expr("(unix_micros(s_end) + 999) div 1000") + 1800L * 1000L >= lit(wmMs)))
      .select(col("user_id"),
        date_format(col("s_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(col("s_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start"))
    val got = StreamQueries.s03StreamSessions(spark, sfDir)
    assert(got.count() > 0)
    val g = rows(got).toSet
    val e = rows(expected).toSet
    assert(g === e,
      s"\nengine-only: ${(g -- e).toSeq.sortBy(_.toString).take(10)}" +
        s"\noracle-only: ${(e -- g).toSeq.sortBy(_.toString).take(10)}")
    // emitted exactly once each (set equality can't see duplicates)
    assert(rows(got).size === rows(expected).size)
  }

  test("s04: emitted interval-join pairs = the batch join (inner emission is complete)") {
    val events = batchEvents
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("click_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
    val expected = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTE"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        round(col("value"), 4).as("value"))
      .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
    val got = StreamQueries.s04StreamIntervalJoin(spark, sfDir)
    assert(got.count() > 0)
    assert(rows(got) === rows(expected))
  }

  test("s05: streaming ingest commits the batch-ingest state exactly once") {
    val out = StreamQueries.s05StreamIngest(spark, sfDir).collect()
    assert(out.length === 25)
    assert(out.map(_.getString(0)).distinct.length === 25) // cross-drop dup collapsed
    assert(out.forall(_.getString(3) == "stream-0")) // batch provenance stamped
  }

  test("s06: streaming corpus dedup absorbs exact and near duplicates sequentially") {
    val out = graft.operators.StreamQueries
      .s06StreamCorpusDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // survivors are unique ids, each tagged with its parity batch
    assert(out.map(_._1).distinct.length === out.length)
    out.foreach { case (id, b) => assert(b === (id % 2).toInt) }
    // something was absorbed (the corpus plants exact + near dups)
    assert(out.length < docs.length, "no duplicates absorbed")
    // no surviving batch-1 doc repeats a batch-0 survivor's exact text
    val kept = out.map(_._1).toSet
    val text0 = docs.filter { case (id, _) => id % 2 == 0 && kept(id) }.map(_._2).toSet
    docs.filter { case (id, _) => id % 2 == 1 && kept(id) }.foreach { case (id, t) =>
      assert(!text0.contains(t), s"batch-1 doc $id repeats a batch-0 text")
    }
    // determinism: a second full run (fresh scratch) is identical
    val again = graft.operators.StreamQueries
      .s06StreamCorpusDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(again.toSeq === out.toSeq)
  }

  test("s08: persisted-index admission ends in exactly s06's corpus state") {
    // the two gates are DEFINED to agree: same admission sequence, the
    // corpus side inline (s06) vs persisted MinHash index (s08) — the
    // strongest spec is literal end-state equality, which also makes
    // the shared DuckDB oracle self-consistent
    val viaIndex = graft.operators.StreamQueries
      .s08StreamMinhashAdmit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val inline = graft.operators.StreamQueries
      .s06StreamCorpusDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(viaIndex.toSeq === inline.toSeq)
    assert(viaIndex.nonEmpty)
  }
}
