package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Tables
import graft.streaming.{IngestStream, SessionStream}

/** Driver-oracle gates for the STREAMING surface (SURVEY.md §2.9) —
  * until now the watermarked-window / streaming-dedup / stateful-
  * session operators were spec-verified only (StreamingSpec). These
  * gates run the REAL Structured Streaming path — file source →
  * watermark → stateful operator → parquet sink, under
  * `Trigger.AvailableNow` — then read back what the stream actually
  * EMITTED and hash-compare it against a DuckDB relational replay that
  * models the same watermark semantics. A hash match therefore pins
  * not just the aggregate arithmetic but the append-mode emission
  * contract itself: which windows/sessions are finalized by the final
  * watermark (max event time − delay) and which remain in state.
  *
  * Determinism: the events table is a single parquet file, so the
  * stream processes it as ONE data micro-batch (no cross-batch
  * late-drop nondeterminism); the finalization flush then happens in
  * the extra no-data batch AvailableNow runs because the watermark
  * advanced (`shouldRunAnotherBatch`). The emission boundary —
  * strict/non-strict against the watermark — is pinned empirically by
  * the oracle inequalities below and by StreamingGateSpec.
  *
  * Scale note: these are the operators whose STATE, not input, must be
  * bounded — windowed agg state is O(windows in flight), dedup state
  * O(keys per watermark window), session state O(open sessions). The
  * gate's finite file feed is the test harness; the operators
  * themselves run identically under `Trigger.ProcessingTime` on an
  * unbounded feed.
  *
  * NOTE these gate functions are EAGER driver-contract entries: the
  * streaming job runs to completion inside the call and the returned
  * frame reads the sink. Plan-inspection tooling (graft.tools.Explain)
  * should target the operators in `graft.streaming` directly — the
  * gate's plan is just a parquet scan of the sink. */
object StreamQueries {

  /** Open the sf events table as a file-source stream with the same
    * TIMESTAMP(NANOS) → micros normalization as the batch loader. */
  private def eventStream(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    // the file stream source watches a DIRECTORY. A Spark-written
    // events table already is one; the driver testdata is a single
    // FILE — expose that through a symlinked watch dir (no copy)
    val streamPath =
      if (new java.io.File(path).isDirectory) path
      else {
        // stable per-source watch dir (no per-invocation temp growth —
        // Bench/ScaleCheck invoke each gate repeatedly)
        val target = java.nio.file.Paths.get(path).toAbsolutePath
        val watch = scratchBase.resolve(
          "src-" + Integer.toHexString(target.toString.hashCode))
        Files.createDirectories(watch)
        val link = watch.resolve("events.parquet")
        // absolute target: a relative sfDir argument would otherwise be
        // stored verbatim and dangle relative to the watch dir
        if (!Files.exists(link)) Files.createSymbolicLink(link, target)
        watch.toString
      }
    // schema must be supplied for file streams; take it from the batch
    // reader so timestamp handling matches exactly
    val raw = spark.read.parquet(path)
    Tables.normalizeTs(
      IngestStream.eventStream(spark, streamPath, raw.schema))
  }

  private def scratchBase: java.nio.file.Path =
    java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft-sgate")

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete(); ()
  }

  /** Run independent write actions as concurrent driver jobs (disjoint
    * output directories) — the streaming gates' two fixture batch
    * files are independent filters of one source, so their writes pay
    * one job-floor wall instead of two (r17; results invariant — the
    * files land byte-identical either way). */
  private def concurrently(writes: (() => Unit)*): Unit =
    DriverJobs.awaitAll(writes.toSeq): Unit

  /** Run a streaming frame to completion under AvailableNow through a
    * parquet sink and return what was emitted. Each gate reuses ONE
    * sink+checkpoint location, wiped at entry — repeated invocations
    * (Bench warmup + 3 passes, ScaleCheck) replace rather than
    * accumulate temp state. An empty emission (every window/session
    * still held by the watermark) returns an empty frame of the right
    * schema, matching the empty oracle result. */
  private def runToSink(df: DataFrame, tag: String): DataFrame = {
    val spark = df.sparkSession
    val base = scratchBase.resolve(tag)
    rmTree(base.toFile)
    Files.createDirectories(base)
    // STATE partitions sized to the state, not the core count: each
    // shuffle partition is a state-store instance committing its own
    // delta files EVERY batch (including the no-data flush batch), so
    // 32 partitions over a few hundred windows/sessions of state pay
    // 64 state commits per gate for no parallelism the tiny state can
    // use (graft.tools.StreamOverhead breakdown: addBatch dominates
    // both batches). 8 still saturates the 64× ScaleCheck tier's real
    // aggregation work; a production stream sizes this to state
    // volume the same way. Save/restore is safe here: the driver
    // contract runs gates sequentially, and the value pins into the
    // query's checkpoint at start.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "8"))
    val q =
      try df.writeStream
        .format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    q.awaitTermination()
    val out = new java.io.File(s"$base/out")
    if (!out.exists())
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)
    else spark.read.schema(df.schema).parquet(out.toString)
  }

  /** s01: watermarked tumbling-window aggregation, append mode — the
    * emitted rows are exactly the windows the 10-minute watermark
    * finalized; the tail windows stay in state and must NOT appear. */
  def s01StreamWindow(spark: SparkSession, dir: String): DataFrame = {
    val agg = IngestStream.windowedEventCounts(
      eventStream(spark, dir), watermark = "10 minutes", window_ = "5 minutes")
    runToSink(agg, "s01")
      .select(
        // epoch seconds: avoids timestamp physical-type skew between
        // the Spark parquet dump (instant) and DuckDB (naive)
        unix_timestamp(col("window_start")).as("window_start"),
        col("event_type"), col("n"),
        round(col("total_value"), 4).as("total_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** s02: streaming exact dedup (`dropDuplicatesWithinWatermark`) over
    * (user_id, event_type) — emitted keys are exactly the distinct key
    * set (single-batch feed: every first occurrence emits; state
    * bounding is the operator's watermark contract, spec-pinned). */
  def s02StreamDedup(spark: SparkSession, dir: String): DataFrame =
    runToSink(IngestStream.dedupStream(
      eventStream(spark, dir), Seq("user_id", "event_type"), "ts",
      watermark = "10 minutes"), "s02")
      .select(col("user_id"), col("event_type"))
      .orderBy(col("user_id"), col("event_type"))

  /** s03: stateful sessionization (flatMapGroupsWithState, event-time
    * timeout) — emits every gap-closed session immediately plus the
    * open tail sessions whose timeout (last event + gap) the final
    * watermark passed; tails inside the last watermark+gap horizon
    * stay in state and must NOT appear. */
  def s03StreamSessions(spark: SparkSession, dir: String): DataFrame =
    runToSink(SessionStream.sessionize(
      eventStream(spark, dir), gapMs = 1800000L, watermark = "1 hour").toDF(),
      "s03")
      .select(
        col("user_id"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("session_start"),
        date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("session_end"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  /** s04: watermarked stream-stream INNER interval join — each click
    * correlated with the same user's purchases in the following 30
    * minutes. Inner-join emission is never watermark-withheld, so on
    * the complete finite feed the emitted set must equal the batch
    * join the oracle replays; the watermark's role here is state
    * eviction (spec-pinned in StreamingGateSpec), which the hash can't
    * see but scale requires. */
  def s04StreamIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val clicks = eventStream(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val purchases = eventStream(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
    val joined = IngestStream.intervalJoin(
      clicks, purchases, "c_user", "p_user", "c_ts", "p_ts",
      watermark = "1 hour", lowerMs = 0L, upperMs = 1800000L)
    runToSink(joined, "s04")
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), round(col("value"), 4).as("value"))
      .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
  }

  /** s05: streaming INGEST end state — parquet file drops through the
    * file-source → foreachBatch → dedup-MERGE path
    * (`IngestStream.nodeIngest`, the reference's sensor-triggered COPY
    * as a stream). Two drops land in the watch dir before the
    * AvailableNow run, with one key duplicated ACROSS the drops: the
    * stored table must hold each key exactly once, stamped with the
    * stream batch's provenance id. A hash match proves the streaming
    * path commits exactly the batch-ingest state — at-least-once file
    * delivery, exactly-once effect. */
  def s05StreamIngest(spark: SparkSession, dir: String): DataFrame = {
    val base = scratchBase.resolve("s05")
    rmTree(base.toFile)
    Files.createDirectories(base)
    // schema + cross-file-duplicate fixture shared with the batch
    // storage gates (st01), so streaming-vs-batch ingest comparisons
    // stay like-for-like
    val store = new graft.storage.GraphStore(
      spark, s"$base/store", "sgate", StorageQueries.storageSchema)
    val rows = Tables.nation(spark, dir).select(
      col("n_name").as("identifier"),
      col("n_nationkey").as("nationkey"),
      col("n_regionkey").as("regionkey"))
    val watch = s"$base/watch"
    val (even, oddPlusDup) = StorageQueries.paritySplit(rows)
    even.coalesce(1).write.mode("append").parquet(watch)
    oddPlusDup.coalesce(1).write.mode("append").parquet(watch)
    val q = IngestStream.nodeIngest(store, "Nation", watch, s"$base/ckpt")
    q.awaitTermination()
    store.node("Nation")
      .select(col("identifier"), col("nationkey"), col("regionkey"),
        col(store.FileIdCol))
      .orderBy(col("identifier"))
  }

  /** s06: STREAMING corpus dedup — the streaming × dedup family
    * composition: documents arrive in two ordered micro-batches
    * (even doc_ids first, then odd; `maxFilesPerTrigger=1` under
    * AvailableNow with explicit mtimes pins the order), and each
    * batch is (a) within-batch exact-deduped (min doc_id per content
    * md5) then (b) deduped against the ACCUMULATED corpus with
    * [[Dedup.dedupAgainst]] (exact md5 anti-join + minhash-banded
    * near-dup with exact word-bigram verify, θ=0.4 — the t37
    * configuration) before its survivors append to the corpus. The
    * returned frame is the corpus end state: (doc_id, batch) rows —
    * each batch-1 survivor proves no earlier-batch exact OR near
    * duplicate absorbed it.
    *
    * The oracle replays the sequential semantics relationally (batch
    * 0 exact-dedup, then batch 1 vs batch-0 SURVIVORS), valid for
    * the same reason as t37: the verify stage is exact (precision 1)
    * and planted near-pairs sit at J ≥ 0.9 where 16-band recall is
    * 1 − 1e-8. At 100 TB this IS the streaming ingest shape:
    * per-batch cost is incoming × corpus-index, never corpus², and
    * the corpus side should be a bucketed signature index maintained
    * incrementally — s08 below runs THIS loop with that index
    * ([[graft.storage.MinHashIndex]]) and must end in the same state. */
  def s06StreamCorpusDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = scratchBase.resolve("s06")
    rmTree(base.toFile)
    Files.createDirectories(base)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val watch = s"$base/watch"
    Files.createDirectories(java.nio.file.Paths.get(watch))
    concurrently(
      () => docs.filter(col("doc_id") % 2 === 0)
        .coalesce(1).write.parquet(s"$watch/b0"),
      () => docs.filter(col("doc_id") % 2 === 1)
        .coalesce(1).write.parquet(s"$watch/b1"))
    // the file source orders by (mtime, path): pin batch order
    val now = System.currentTimeMillis()
    def stamp(sub: String, t: Long): Unit = {
      val d = new java.io.File(s"$watch/$sub")
      (d +: Option(d.listFiles()).toSeq.flatten).foreach(_.setLastModified(t))
    }
    stamp("b0", now - 120000); stamp("b1", now)
    val corpusDir = s"$base/corpus"
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(watch)
    val q = stream.writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        corpusDedupAppend(batch, corpusDir, batchId)
      }
      .start()
    q.awaitTermination()
    readCorpus(spark, corpusDir)
      .select(col("doc_id"), (col("doc_id") % 2).cast("int").as("batch"))
      .orderBy(col("doc_id"))
  }

  /** The accumulated s06 corpus: exactly the COMMITTED batch dirs
    * (those with a `_SUCCESS` marker) — a crashed attempt's partial
    * files are never read, so a replay can't dedup against its own
    * leftovers. */
  private[graft] def committedBatchDirs(corpusDir: String): Seq[String] =
    Option(new java.io.File(corpusDir).listFiles()).toSeq.flatten
      .filter(d => d.isDirectory && new java.io.File(d, "_SUCCESS").exists())
      .map(_.toString).sorted

  private[graft] def readCorpus(spark: SparkSession, corpusDir: String): DataFrame =
    spark.read.parquet(committedBatchDirs(corpusDir): _*)

  /** s06's per-batch body, IDEMPOTENT for at-least-once foreachBatch
    * (the s07/Bm25Index batchTag discipline): each batch's survivors
    * land in their own `b<batchId>` dir, and a dir whose `_SUCCESS`
    * marker exists makes the replay a NO-OP. Without the guard a
    * replayed batch is not merely double-appended — dedupAgainst
    * would run against a corpus already holding this batch's
    * survivors, absorb every doc as a self-duplicate, and write an
    * EMPTY survivor set (data loss on retry). */
  private[graft] def corpusDedupAppend(
      batch: DataFrame, corpusDir: String, batchId: Long): Unit = {
    import org.apache.spark.sql.expressions.Window
    val spark = batch.sparkSession
    val out = new java.io.File(corpusDir, s"b$batchId")
    if (new java.io.File(out, "_SUCCESS").exists()) return
    // (a) within-batch exact dedup, min doc_id per content hash
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val clean = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val committed = committedBatchDirs(corpusDir)
    if (committed.isEmpty)
      clean.write.mode("overwrite").parquet(out.toString)
    else PipelineContext.run { implicit ctx =>
      // (b) exact + near dedup against the accumulated corpus; the
      // write IS the consuming action (staged frames free only after
      // it lands). Overwrite into the batch-own dir: a crashed
      // half-written attempt (no _SUCCESS) is simply redone, and the
      // corpus read above can never see its partial files.
      Dedup.dedupAgainst(
        clean, spark.read.parquet(committed: _*), "doc_id", "text",
        shingle = Dedup.WordGrams(2), numHashes = 64, bands = 16,
        minJaccard = 0.4)
        .write.mode("overwrite").parquet(out.toString)
    }
  }

  /** s07: STREAMING retrieval-index ingest — the streaming ×
    * persisted-index composition. Documents arrive in two ordered
    * micro-batches; each batch lands as a CAS-committed [[graft
    * .storage.Bm25Index]] segment inside foreachBatch; after ingest
    * the maintenance path runs (compact folds the per-trigger
    * segments to one, vacuum is a no-op inside the retention window);
    * and the final ranking over the incrementally-built, compacted
    * index must hash-match the INLINE single-pass BM25 oracle (t47's
    * SQL) — batch boundaries, segmentation, compaction and the
    * streaming commit path all invisible in the scores. This is the
    * 100 TB serving shape end-to-end: continuous ingest appending
    * atomic segments, periodic compaction, pruned queries. */
  def s07StreamBm25Index(spark: SparkSession, dir: String): DataFrame = {
    val base = scratchBase.resolve("s07")
    rmTree(base.toFile)
    Files.createDirectories(base)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val watch = s"$base/watch"
    Files.createDirectories(java.nio.file.Paths.get(watch))
    concurrently(
      () => docs.filter(col("doc_id") % 4 < 3)
        .coalesce(1).write.parquet(s"$watch/b0"),
      () => docs.filter(col("doc_id") % 4 === 3)
        .coalesce(1).write.parquet(s"$watch/b1"))
    // the file source orders by (mtime, path): pin batch order
    val now = System.currentTimeMillis()
    def stamp(sub: String, t: Long): Unit = {
      val d = new java.io.File(s"$watch/$sub")
      (d +: Option(d.listFiles()).toSeq.flatten).foreach(_.setLastModified(t))
    }
    stamp("b0", now - 120000); stamp("b1", now)
    val idx = new graft.storage.Bm25Index(spark, s"$base/idx", nBuckets = 16)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(watch)
    val q = stream.writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the batch id tags the segment: an at-least-once replay of
        // the same micro-batch (post-failure restart) is a no-op
        // instead of a tf/df/stats double count
        if (!batch.isEmpty)
          idx.append(batch, "doc_id", "text", batchTag = Some(s"s07:$batchId"))
      }
      .start()
    q.awaitTermination()
    // the post-ingest maintenance pass, under the oracle — the DEBT
    // dispatch (r16 missing #2): below the tombstone threshold it IS
    // the tiered policy (per-trigger segments share a size tier and
    // fold; a compacted giant is left alone), past it the one full
    // rewrite reclaims takedown debt. Scores are invariant either way
    // — TieredCompactionSpec pins it — so the oracle gates the
    // production maintenance call, not a special one.
    idx.maintainCompaction(): Unit
    idx.vacuum()  // no-op here (retention covers the pre-merge head)
    idx.topDocs(Seq(
        (1L, "dup join"),
        (2L, "hash table scan"),
        (3L, "spark window agg")), k = 10)
      .orderBy(col("qid"), col("rank"))
  }

  /** s08: STREAMING near-dup admission against the PERSISTED MinHash
    * index — s06's continuous-crawl loop with the accumulated corpus
    * replaced by [[graft.storage.MinHashIndex]]: each micro-batch is
    * within-batch exact-deduped, admitted against the index head
    * (banded candidate probe over bucket-pruned persisted signatures —
    * the batch never re-shingles the corpus), and its SURVIVORS append
    * as a new CAS-committed segment. Replay safety is the head tag
    * check: a replayed batch would otherwise dedup against an index
    * already holding its own survivors and admit nothing — the s06
    * data-loss-on-retry class, here guarded by one driver-side
    * manifest read instead of a _SUCCESS marker. The end state (the
    * index's live doc ids) must hash-match s06's oracle exactly:
    * batch boundaries, segmentation and the amortized existing side
    * all invisible. At 100 TB this is the crawl-admission shape:
    * per-batch cost is incoming × probed-buckets, the corpus is
    * signed once, and maintenance (compact) folds per-trigger
    * segments without changing a single admission. */
  def s08StreamMinhashAdmit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = scratchBase.resolve("s08")
    rmTree(base.toFile)
    Files.createDirectories(base)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val watch = s"$base/watch"
    Files.createDirectories(java.nio.file.Paths.get(watch))
    concurrently(
      () => docs.filter(col("doc_id") % 2 === 0)
        .coalesce(1).write.parquet(s"$watch/b0"),
      () => docs.filter(col("doc_id") % 2 === 1)
        .coalesce(1).write.parquet(s"$watch/b1"))
    // the file source orders by (mtime, path): pin batch order
    val now = System.currentTimeMillis()
    def stamp(sub: String, t: Long): Unit = {
      val d = new java.io.File(s"$watch/$sub")
      (d +: Option(d.listFiles()).toSeq.flatten).foreach(_.setLastModified(t))
    }
    stamp("b0", now - 120000); stamp("b1", now)
    val idx = new graft.storage.MinHashIndex(spark, s"$base/idx",
      shingle = Dedup.WordGrams(2), numHashes = 64, bands = 16,
      nBuckets = 16)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(watch)
    val q = stream.writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val tag = s"s08:$batchId"
        // head tag check FIRST: a replayed batch must not re-probe an
        // index that already committed its survivors (it would admit
        // nothing); append's own guard alone is too late
        if (!batch.isEmpty && !idx.committedBatchTags.contains(tag)) {
          val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
          val clean = batch.withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1).drop("__rn")
          // survivors feed append INSIDE the probe's context: append's
          // write jobs must run while the staged probe frames are live
          PipelineContext.run { implicit ctx =>
            val survivors =
              if (idx.segments.isEmpty) clean
              else idx.dedupAgainst(clean, "doc_id", "text",
                minJaccard = 0.4)
            idx.append(survivors, "doc_id", "text", batchTag = Some(tag))
          }
        }
      }
      .start()
    q.awaitTermination()
    // maintenance under the oracle: admissions unchanged — the debt
    // dispatch degrades to the tiered fold below the tombstone
    // threshold (r16 missing #2), never an unearned full rewrite
    idx.maintainCompaction(): Unit
    idx.vacuum(): Unit
    idx.liveDocIds
      .select(col("id").as("doc_id"),
        (col("id") % 2).cast("int").as("batch"))
      .orderBy(col("doc_id"))
  }

  /** s09: STREAMING embedding near-dup admission against the PERSISTED
    * [[graft.storage.EmbedIndex]] — the multimodal-crawl production
    * loop (VERDICT r15 missing #1), s08's shape with the corpus side
    * replaced by the embedding index: even vec_ids land first (the
    * index is empty — all admitted), odd vec_ids then probe the stored
    * head under the tag-guarded foreachBatch, and the PRODUCTION
    * maintenance call ([[graft.storage.BandedDocsIndex
    * .maintainCompaction]] — the debt dispatch, tiered below the
    * tombstone threshold) runs in-loop after each append.
    *
    * Oracle shape: unlike s08's text corpus, the i.i.d. embedding
    * testdata plants no cosine-1 pairs, so banding recall at θ=0.35 is
    * deliberately partial — end-state equality against an exact
    * relational replay is not the operator's contract (precision is:
    * every drop is exact-cosine verified). The gate therefore pins,
    * t70-style: every even admitted (`n_live_even`, oracle-checkable),
    * the exact droppable count recomputed relationally
    * (`n_droppable`), zero false drops (engine-verified, exact),
    * recall ≥ 0.3 as an engine-computed invariant the oracle states
    * TRUE — and `ends_equal_batch`: the streaming end state equals the
    * one-shot batch composition over the same data (append evens,
    * probe+append odd survivors), which pins batch boundaries,
    * segmentation, in-loop tiered compaction and the replay guard as
    * invisible in the committed corpus. At 100 TB this is the
    * continuous multimodal-crawl shape: vectors are banded and normed
    * once at admission, each batch probes only its own bucket set, and
    * maintenance folds per-trigger segments at tiered cost. */
  def s09StreamEmbedAdmit(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions
    val base = scratchBase.resolve("s09")
    rmTree(base.toFile)
    Files.createDirectories(base)
    val thr = 0.35
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val watch = s"$base/watch"
    Files.createDirectories(java.nio.file.Paths.get(watch))
    concurrently(
      () => emb.filter(col("vec_id") % 2 === 0)
        .coalesce(1).write.parquet(s"$watch/b0"),
      () => emb.filter(col("vec_id") % 2 === 1)
        .coalesce(1).write.parquet(s"$watch/b1"))
    // the file source orders by (mtime, path): pin batch order
    val now = System.currentTimeMillis()
    def stamp(sub: String, t: Long): Unit = {
      val d = new java.io.File(s"$watch/$sub")
      (d +: Option(d.listFiles()).toSeq.flatten).foreach(_.setLastModified(t))
    }
    stamp("b0", now - 120000); stamp("b1", now)
    val idx = new graft.storage.EmbedIndex(spark, s"$base/idx", dim = 64,
      nPlanes = 4, bands = 4, nBuckets = 16)
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(watch)
    val q = stream.writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val tag = s"s09:$batchId"
        // head tag check FIRST (the s08 rule): a replayed batch must
        // not re-probe an index already holding its survivors
        if (!batch.isEmpty && !idx.committedBatchTags.contains(tag)) {
          PipelineContext.run { implicit ctx =>
            val survivors =
              if (idx.segments.isEmpty) batch
              else idx.dedupAgainst(batch, "vec_id", "embedding",
                minCosine = thr)
            idx.append(survivors, "vec_id", "embedding",
              batchTag = Some(tag))
          }
          // in-loop maintenance — the production cadence is the debt
          // dispatch (r16 missing #2); admissions and the end state
          // are invariant (TieredCompactionSpec)
          idx.maintainCompaction(): Unit
        }
      }
      .start()
    q.awaitTermination()
    idx.vacuum(): Unit
    // the one-shot batch composition over the same data — the
    // equality target for ends_equal_batch
    val ref = new graft.storage.EmbedIndex(spark, s"$base/ref", dim = 64,
      nPlanes = 4, bands = 4, nBuckets = 16)
    val even = emb.filter(col("vec_id") % 2 === 0)
    val odd = emb.filter(col("vec_id") % 2 === 1)
    ref.append(even, "vec_id", "embedding")
    PipelineContext.run { implicit ctx =>
      ref.append(ref.dedupAgainst(odd, "vec_id", "embedding",
        minCosine = thr), "vec_id", "embedding")
    }
    PipelineContext.materialize { implicit ctx =>
      val live = ctx.stage(idx.liveDocIds.select(col("id").as("vec_id")))
      val refLive = ref.liveDocIds.select(col("id").as("vec_id"))
      val dropped = ctx.stage(odd
        .join(live, Seq("vec_id"), "left_anti")
        .select(col("vec_id")))
      // exact per-incoming max cosine against the existing corpus —
      // O(|odd|·|even|), the t70 oracle's own bill
      val maxCos = ctx.stage(odd
        .select(col("vec_id").as("iid"), col("embedding").as("iv"))
        .crossJoin(even.select(col("embedding").as("ev")))
        .groupBy(col("iid"))
        .agg(max(VectorFunctions.cosine(col("iv"), col("ev"))).as("mc")))
      val nIn = odd.agg(count(lit(1)).as("n_incoming"))
      val nLiveEven = live.filter(col("vec_id") % 2 === 0)
        .agg(count(lit(1)).as("n_live_even"))
      val nDroppable = maxCos.filter(col("mc") >= thr)
        .agg(count(lit(1)).as("n_droppable"))
      val nFalse = dropped
        .join(maxCos, dropped("vec_id") === maxCos("iid"), "left")
        .filter(col("mc").isNull || col("mc") < thr)
        .agg(count(lit(1)).as("n_false_drops"))
      val nDropped = dropped.agg(count(lit(1)).as("n_dropped"))
      val nDiff = live.join(refLive, Seq("vec_id"), "left_anti")
        .unionByName(refLive.join(live, Seq("vec_id"), "left_anti"))
        .agg(count(lit(1)).as("n_diff"))
      nIn.crossJoin(nLiveEven).crossJoin(nDroppable).crossJoin(nFalse)
        .crossJoin(nDropped).crossJoin(nDiff)
        .select(col("n_incoming"), col("n_live_even"), col("n_droppable"),
          col("n_false_drops"),
          (col("n_droppable") === 0 ||
            col("n_dropped").cast("double") / col("n_droppable") >= lit(0.3))
            .as("recall_met"),
          (col("n_diff") === 0).as("ends_equal_batch"))
    }
  }

  /** s10: the composed CROSS-INDEX crawl loop ([[CrawlLoop]], VERDICT
    * r15 missing #4) under the driver oracle — one AvailableNow stream
    * whose each micro-batch runs text admission (MinHash), embedding
    * admission (EmbedIndex) and retrieval indexing (BM25 append of the
    * jointly-admitted docs) with one shared tag, tiered maintenance on
    * all three heads between batches.
    *
    * Corpus: documents ⋈ embeddings on doc_id = vec_id, with PLANTED
    * embedding near-duplicates — every doc_id % 10 == 5 (odd, batch 1)
    * carries ×2 the (doc_id − 1) vector. Doubling preserves exact
    * cosine (≡ 1) and the banded sign masks, so the embedding stage's
    * recall on planted pairs is exactly 1 while the i.i.d. background
    * (max pairwise cosine ≈ 0.51) never reaches θ = 0.8; the text
    * stage is s06/s08's replayable configuration verbatim. The gate's
    * output full-outer-joins the three heads' live id sets with
    * presence flags, so an id present in ANY head but not all three
    * becomes a row/hash mismatch — the oracle replays the sequential
    * admission relationally and states TRUE/TRUE/TRUE per admitted
    * doc. At 100 TB this is the production crawl: per-batch cost is
    * incoming × probed-buckets on both near-dup heads, the admitted
    * frame fans into three writers with no cross-index shuffle, and
    * the heads stay mutually consistent under replays and partial
    * failures by the ledger-first commit order (CrawlLoopSpec drives
    * the crash matrix). */
  def s10StreamCrawl(spark: SparkSession, dir: String): DataFrame =
    s10StreamCrawlAt(spark, dir, nPlanes = 8)

  /** [[s10StreamCrawl]] with the embed head's plane count exposed —
    * results are plane-count-invariant (planted copies collide at ANY
    * plane count by sign-mask identity; every drop is exact-verified),
    * so ScaleCheck can run the loop under the generation rule
    * (nPlanes ∝ log₂ k) while the gate pins one fixed configuration. */
  /** The crawl-family corpus: documents ⋈ embeddings on doc_id =
    * vec_id, with the planted ×2-copy embedding near-dups (class doc
    * of [[s10StreamCrawl]]) — shared by s10 and the t74 takedown
    * gate so both sides replay the SAME construction. */
  private[graft] def crawlJoint(
      spark: SparkSession, dir: String): DataFrame =
    crawlJoint(spark, dir, plantWithinBatch = false)

  /** `plantWithinBatch = true` (the t75 maintenance gate) additionally
    * plants WITHIN-batch embedding near-dups — every doc_id % 20 == 6
    * (even, batch 0) carries ×2 the (doc_id − 2) vector, also even —
    * which ADMISSION cannot see (batch 0 lands in an empty index, and
    * within-batch dedup is exact-text only): exactly the residue the
    * periodic cross-index dedup fixpoint exists to clear. */
  private[graft] def crawlJoint(
      spark: SparkSession, dir: String,
      plantWithinBatch: Boolean): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val prev = emb.select((col("vec_id") + 1).as("pid"),
      col("embedding").as("prev_emb"))
    val prev2 = emb.select((col("vec_id") + 2).as("p2id"),
      col("embedding").as("prev2_emb"))
    val base = docs
      .join(emb, docs("doc_id") === emb("vec_id")).drop("vec_id")
      .join(prev, col("doc_id") === prev("pid"), "left").drop("pid")
      .join(prev2, col("doc_id") === prev2("p2id"), "left").drop("p2id")
    val planted =
      when(col("doc_id") % 10 === 5 && col("prev_emb").isNotNull,
        transform(col("prev_emb"), x => x * lit(2.0f)))
    val withinBatch =
      if (plantWithinBatch)
        planted.when(col("doc_id") % 20 === 6 && col("prev2_emb").isNotNull,
          transform(col("prev2_emb"), x => x * lit(2.0f)))
      else planted
    base.select(col("doc_id"), col("text"),
      withinBatch.otherwise(col("embedding")).as("embedding"))
  }

  /** The three crawl heads' live id sets full-outer-joined with
    * presence flags — the gate output shape s10 and t74 share: an id
    * in ANY head but not all three is a row/hash mismatch. */
  private[graft] def crawlHeadsOut(
      mh: graft.storage.MinHashIndex, em: graft.storage.EmbedIndex,
      bm: graft.storage.Bm25Index): DataFrame = {
    val m = mh.liveDocIds
      .select(col("id").as("doc_id"), lit(true).as("in_minhash"))
    val ei = em.liveDocIds
      .select(col("id").as("doc_id"), lit(true).as("in_embed"))
    val bi = bm.liveDocIds
      .select(col("id").as("doc_id"), lit(true).as("in_bm25"))
    m.join(ei, Seq("doc_id"), "full_outer")
      .join(bi, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), (col("doc_id") % 2).cast("int").as("batch"),
        coalesce(col("in_minhash"), lit(false)).as("in_minhash"),
        coalesce(col("in_embed"), lit(false)).as("in_embed"),
        coalesce(col("in_bm25"), lit(false)).as("in_bm25"))
      .orderBy(col("doc_id"))
  }

  private[graft] def s10StreamCrawlAt(
      spark: SparkSession, dir: String, nPlanes: Int): DataFrame = {
    val base = scratchBase.resolve("s10")
    rmTree(base.toFile)
    Files.createDirectories(base)
    val joint = crawlJoint(spark, dir)
    val watch = s"$base/watch"
    Files.createDirectories(java.nio.file.Paths.get(watch))
    // staged: the 3-join corpus construction feeds both batch writes —
    // one computation instead of two (r17); both writes are eager
    // inside the context
    PipelineContext.run { implicit ctx =>
      val j = ctx.stage(joint)
      concurrently(
        () => j.filter(col("doc_id") % 2 === 0)
          .coalesce(1).write.parquet(s"$watch/b0"),
        () => j.filter(col("doc_id") % 2 === 1)
          .coalesce(1).write.parquet(s"$watch/b1"))
    }
    // the file source orders by (mtime, path): pin batch order
    val now = System.currentTimeMillis()
    def stamp(sub: String, t: Long): Unit = {
      val d = new java.io.File(s"$watch/$sub")
      (d +: Option(d.listFiles()).toSeq.flatten).foreach(_.setLastModified(t))
    }
    stamp("b0", now - 120000); stamp("b1", now)
    val mh = new graft.storage.MinHashIndex(spark, s"$base/mh",
      shingle = Dedup.WordGrams(2), numHashes = 64, bands = 16,
      nBuckets = 16)
    val em = new graft.storage.EmbedIndex(spark, s"$base/em", dim = 64,
      nPlanes = nPlanes, bands = 4, nBuckets = 16)
    val bm = new graft.storage.Bm25Index(spark, s"$base/bm", nBuckets = 16)
    val stream = spark.readStream.schema(joint.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(watch)
    val q = stream.writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          CrawlLoop.admitBatch(mh, em, bm, batch,
            "doc_id", "text", "embedding", tag = s"s10:$batchId",
            minJaccard = 0.4, minCosine = 0.8)
          CrawlLoop.maintain(mh, em, bm): Unit
        }
      }
      .start()
    q.awaitTermination()
    crawlHeadsOut(mh, em, bm)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_stream_window" -> (s01StreamWindow(_, _)),
    "s02_stream_dedup" -> (s02StreamDedup(_, _)),
    "s03_stream_sessions" -> (s03StreamSessions(_, _)),
    "s04_stream_interval_join" -> (s04StreamIntervalJoin(_, _)),
    "s05_stream_ingest" -> (s05StreamIngest(_, _)),
    "s06_stream_corpus_dedup" -> (s06StreamCorpusDedup(_, _)),
    "s07_stream_bm25_index" -> (s07StreamBm25Index(_, _)),
    "s08_stream_minhash_admit" -> (s08StreamMinhashAdmit(_, _)),
    "s09_stream_embed_admit" -> (s09StreamEmbedAdmit(_, _)),
    "s10_stream_crawl" -> (s10StreamCrawl(_, _)))

  /** Sequential two-batch admission replay, shared by s06 (inline
    * accumulated-corpus dedup) and s08 (persisted MinHash index): both
    * run the same even-then-odd admission sequence at θ=0.4 with
    * word-bigram shingles, so their end states are identical by
    * construction. */
  private val corpusDedupOracle: String =
    """WITH d AS (
           SELECT doc_id, text, CAST(doc_id % 2 AS INT) AS batch
           FROM documents),
         e0 AS (
           SELECT doc_id, text FROM d WHERE batch = 0
           QUALIFY row_number() OVER (PARTITION BY md5(text)
                                      ORDER BY doc_id) = 1),
         e1 AS (
           SELECT doc_id, text FROM d WHERE batch = 1
           QUALIFY row_number() OVER (PARTITION BY md5(text)
                                      ORDER BY doc_id) = 1),
         x1 AS (
           SELECT e1.doc_id, e1.text FROM e1
           WHERE NOT EXISTS (SELECT 1 FROM e0 WHERE e0.text = e1.text)),
         g0 AS (
           SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g
           FROM (SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS w
                 FROM e0)
           WHERE len(w) >= 2),
         g1 AS (
           SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g
           FROM (SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS w
                 FROM x1)
           WHERE len(w) >= 2),
         dropped AS (
           SELECT DISTINCT i.doc_id
           FROM g1 i JOIN g0 e
             ON len(list_intersect(i.g, e.g))::DOUBLE /
                (len(i.g) + len(e.g) - len(list_intersect(i.g, e.g))) >= 0.4)
         SELECT doc_id, 0 AS batch FROM e0
         UNION ALL
         SELECT doc_id, 1 AS batch FROM x1
         WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
         ORDER BY doc_id"""

  /** DuckDB replay of the emitted state, watermark semantics included. */
  val oracle: Map[String, String] = Map(
    // the streamed, segmented, compacted index must score exactly like
    // one inline pass over the whole corpus — t47's oracle verbatim
    "s07_stream_bm25_index" -> PipelineQueries.bm25Oracle,
    // sequential two-batch replay: batch 0 keeps min doc_id per
    // content hash; batch 1 additionally survives exact AND exact
    // word-bigram-Jaccard >= 0.4 checks against batch 0's SURVIVORS
    // (the t37 recall/precision argument makes the minhash path
    // replayable). s08 runs the SAME admission sequence with the
    // corpus side persisted as a MinHash index — identical end state
    // by construction, so the oracle is shared verbatim.
    "s06_stream_corpus_dedup" -> corpusDedupOracle,
    "s08_stream_minhash_admit" -> corpusDedupOracle,
    // s09: the t70 oracle pattern on the streaming loop — the exact
    // droppable count recomputed relationally; n_live_even pins every
    // first-batch vector admitted; false drops are 0 by the index's
    // verified-drop construction; recall and streaming-vs-batch
    // end-state equality are engine-computed invariants the oracle
    // states TRUE (both deterministic: fixed seeds, fixed data, and
    // the one-shot composition runs the same probes on the same head
    // states)
    "s09_stream_embed_admit" ->
      """WITH mc AS (
           SELECT i.vec_id,
             max(list_reduce(list_prepend(0.0,
               list_transform(list_zip(i.embedding, e.embedding),
                 x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))),
               (p, c) -> p + c)
             / (sqrt(list_reduce(list_prepend(0.0,
                  list_transform(i.embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                  (p, c) -> p + c))
              * sqrt(list_reduce(list_prepend(0.0,
                  list_transform(e.embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                  (p, c) -> p + c)))) AS mc
           FROM embeddings i JOIN embeddings e
             ON i.vec_id % 2 = 1 AND e.vec_id % 2 = 0
           GROUP BY i.vec_id)
         SELECT
           (SELECT count(*) FROM embeddings WHERE vec_id % 2 = 1)
             AS n_incoming,
           (SELECT count(*) FROM embeddings WHERE vec_id % 2 = 0)
             AS n_live_even,
           (SELECT count(*) FROM mc WHERE mc >= 0.35) AS n_droppable,
           CAST(0 AS BIGINT) AS n_false_drops,
           TRUE AS recall_met,
           TRUE AS ends_equal_batch""",
    // s10: the cross-index crawl replayed sequentially — batch 0
    // (even doc_ids) keeps min-id per content hash and is fully
    // admitted; batch 1 (odd) additionally survives exact text, exact
    // word-bigram Jaccard >= 0.4 (the s06/s08 recall argument) AND
    // exact cosine >= 0.8 against batch 0's survivors (the planted
    // ×2-copy construction makes the embedding stage's recall exactly
    // 1 — t71's argument). Every admitted doc must be in ALL THREE
    // heads: a divergent head surfaces as a row whose flag the oracle
    // says is TRUE. t74 reuses the replay with the takedown id set
    // removed at the end ([[crawlOracle]]).
    "s10_stream_crawl" -> crawlOracle("")) ++ watermarkOracles

  /** The crawl-family relational replay, parameterized by a final
    * live-set predicate — "" for s10 (admission only); t74 appends
    * the takedown exclusion (a takedown removes only LIVE ids, so
    * filtering the admitted set IS its exact semantics). */
  private[graft] def crawlOracle(finalFilter: String): String =
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         j AS (
           SELECT d.doc_id, d.text,
             CASE WHEN d.doc_id % 10 = 5 AND p.vec_id IS NOT NULL
               THEN list_transform(p.embedding, x -> x * 2)
               ELSE e.embedding END AS emb
           FROM documents d
           JOIN e ON d.doc_id = e.vec_id
           LEFT JOIN e p ON p.vec_id = d.doc_id - 1),
         e0 AS (
           SELECT doc_id, text, emb FROM j WHERE doc_id % 2 = 0
           QUALIFY row_number() OVER (PARTITION BY md5(text)
                                      ORDER BY doc_id) = 1),
         e1 AS (
           SELECT doc_id, text, emb FROM j WHERE doc_id % 2 = 1
           QUALIFY row_number() OVER (PARTITION BY md5(text)
                                      ORDER BY doc_id) = 1),
         x1 AS (
           SELECT e1.doc_id, e1.text, e1.emb FROM e1
           WHERE NOT EXISTS (SELECT 1 FROM e0 WHERE e0.text = e1.text)),
         g0 AS (
           SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g
           FROM (SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\\s+') AS w
                 FROM e0)
           WHERE len(w) >= 2),
         g1 AS (
           SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g
           FROM (SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\\s+') AS w
                 FROM x1)
           WHERE len(w) >= 2),
         tdrop AS (
           SELECT DISTINCT i.doc_id
           FROM g1 i JOIN g0 t
             ON len(list_intersect(i.g, t.g))::DOUBLE /
                (len(i.g) + len(t.g) - len(list_intersect(i.g, t.g))) >= 0.4),
         ts AS (
           SELECT doc_id, emb FROM x1
           WHERE doc_id NOT IN (SELECT doc_id FROM tdrop)),
         n0 AS (
           SELECT doc_id, emb,
             sqrt(list_reduce(list_prepend(0.0,
               list_transform(emb,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (p, c) -> p + c)) AS nrm
           FROM e0),
         ns AS (
           SELECT doc_id, emb,
             sqrt(list_reduce(list_prepend(0.0,
               list_transform(emb,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (p, c) -> p + c)) AS nrm
           FROM ts),
         edrop AS (
           SELECT DISTINCT s.doc_id
           FROM ns s JOIN n0 t
             ON list_reduce(list_prepend(0.0,
                  list_transform(list_zip(s.emb, t.emb),
                    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))),
                  (p, c) -> p + c) / (s.nrm * t.nrm) >= 0.8)
         SELECT doc_id, CAST(doc_id % 2 AS INT) AS batch,
                TRUE AS in_minhash, TRUE AS in_embed, TRUE AS in_bm25
         FROM (
           SELECT doc_id FROM e0
           UNION ALL
           SELECT doc_id FROM ts
           WHERE doc_id NOT IN (SELECT doc_id FROM edrop))
         WHERE 1 = 1$finalFilter
         ORDER BY doc_id"""

  /** The t75 oracle: [[crawlOracle]]'s sequential-admission replay
    * over the WITHIN-BATCH-planted corpus (`plantWithinBatch`), then
    * the cross-index periodic dedup fixpoint replayed from first
    * principles — t69's pattern (exact pairs → recursive-CTE closure
    * → keep-min-per-component) for the TEXT head, then t71's exact-
    * cosine pattern over the text survivors for the EMBED head, the
    * exact order [[graft.operators.CrawlLoop.maintainDedup]] runs and
    * propagates. Output is the three-head flag shape: a hash match
    * proves both fixpoints' drop sets landed in every head and
    * nothing else moved. */
  private[graft] val crawlMaintOracle: String =
    """WITH RECURSIVE e AS (SELECT vec_id, embedding FROM embeddings),
         j AS (
           SELECT d.doc_id, d.text,
             CASE WHEN d.doc_id % 10 = 5 AND p.vec_id IS NOT NULL
               THEN list_transform(p.embedding, x -> x * 2)
             WHEN d.doc_id % 20 = 6 AND p2.vec_id IS NOT NULL
               THEN list_transform(p2.embedding, x -> x * 2)
             ELSE e.embedding END AS emb
           FROM documents d
           JOIN e ON d.doc_id = e.vec_id
           LEFT JOIN e p ON p.vec_id = d.doc_id - 1
           LEFT JOIN e p2 ON p2.vec_id = d.doc_id - 2),
         e0 AS (
           SELECT doc_id, text, emb FROM j WHERE doc_id % 2 = 0
           QUALIFY row_number() OVER (PARTITION BY md5(text)
                                      ORDER BY doc_id) = 1),
         e1 AS (
           SELECT doc_id, text, emb FROM j WHERE doc_id % 2 = 1
           QUALIFY row_number() OVER (PARTITION BY md5(text)
                                      ORDER BY doc_id) = 1),
         x1 AS (
           SELECT e1.doc_id, e1.text, e1.emb FROM e1
           WHERE NOT EXISTS (SELECT 1 FROM e0 WHERE e0.text = e1.text)),
         g0 AS (
           SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g
           FROM (SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS w
                 FROM e0)
           WHERE len(w) >= 2),
         g1 AS (
           SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g
           FROM (SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS w
                 FROM x1)
           WHERE len(w) >= 2),
         tdrop AS (
           SELECT DISTINCT i.doc_id
           FROM g1 i JOIN g0 t
             ON len(list_intersect(i.g, t.g))::DOUBLE /
                (len(i.g) + len(t.g) - len(list_intersect(i.g, t.g))) >= 0.4),
         ts AS (
           SELECT doc_id, text, emb FROM x1
           WHERE doc_id NOT IN (SELECT doc_id FROM tdrop)),
         n0 AS (
           SELECT doc_id, emb,
             sqrt(list_reduce(list_prepend(0.0,
               list_transform(emb,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (p, c) -> p + c)) AS nrm
           FROM e0),
         ns AS (
           SELECT doc_id, emb,
             sqrt(list_reduce(list_prepend(0.0,
               list_transform(emb,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (p, c) -> p + c)) AS nrm
           FROM ts),
         edrop AS (
           SELECT DISTINCT s.doc_id
           FROM ns s JOIN n0 t
             ON list_reduce(list_prepend(0.0,
                  list_transform(list_zip(s.emb, t.emb),
                    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))),
                  (p, c) -> p + c) / (s.nrm * t.nrm) >= 0.8),
         adm AS (
           SELECT doc_id, text, emb FROM e0
           UNION ALL
           SELECT doc_id, text, emb FROM ts
           WHERE doc_id NOT IN (SELECT doc_id FROM edrop)),
         ga AS (
           SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g
           FROM (SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS w
                 FROM adm)
           WHERE len(w) >= 2),
         tp AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2
           FROM ga a JOIN ga b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.g, b.g))::DOUBLE /
                 (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.4),
         te AS (
           SELECT id1 AS u, id2 AS v FROM tp
           UNION SELECT id2, id1 FROM tp),
         treach(u, v) AS (
           SELECT u, v FROM te
           UNION
           SELECT r.u, t2.v FROM treach r JOIN te t2 ON r.v = t2.u),
         tdropped AS (
           SELECT u AS doc_id FROM treach GROUP BY u HAVING min(v) < u),
         live1 AS (
           SELECT doc_id, emb FROM adm
           WHERE doc_id NOT IN (SELECT doc_id FROM tdropped)),
         nl AS (
           SELECT doc_id, emb,
             sqrt(list_reduce(list_prepend(0.0,
               list_transform(emb,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (p, c) -> p + c)) AS nrm
           FROM live1),
         ep AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2
           FROM nl a JOIN nl b ON a.doc_id < b.doc_id
           WHERE list_reduce(list_prepend(0.0,
                   list_transform(list_zip(a.emb, b.emb),
                     x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))),
                   (p, c) -> p + c) / (a.nrm * b.nrm) >= 0.8),
         ee AS (
           SELECT id1 AS u, id2 AS v FROM ep
           UNION SELECT id2, id1 FROM ep),
         ereach(u, v) AS (
           SELECT u, v FROM ee
           UNION
           SELECT r.u, e3.v FROM ereach r JOIN ee e3 ON r.v = e3.u),
         edropped AS (
           SELECT u AS doc_id FROM ereach GROUP BY u HAVING min(v) < u)
         SELECT doc_id, CAST(doc_id % 2 AS INT) AS batch,
                TRUE AS in_minhash, TRUE AS in_embed, TRUE AS in_bm25
         FROM live1
         WHERE doc_id NOT IN (SELECT doc_id FROM edropped)
         ORDER BY doc_id"""

  private lazy val watermarkOracles: Map[String, String] = Map(
    // a window is emitted iff its END is at or below the final
    // watermark — which Spark computes at MILLISECOND resolution
    // (floor-to-ms of max event time, minus the delay; non-strict <=
    // eviction, both pinned by WatermarkBoundarySpec); time_bucket
    // aligns identically to Spark's epoch-aligned 5-minute windows
    "s01_stream_window" ->
      """WITH wm AS (
           SELECT epoch_us(max(ts)) // 1000 - 600000 AS wm_ms FROM events),
         agg AS (
           SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws, event_type,
                  count(*) AS n, round(sum(value), 4) AS total_value
           FROM events GROUP BY 1, 2)
         SELECT CAST(floor(epoch(ws)) AS BIGINT) AS window_start,
                event_type, n, total_value
         FROM agg, wm
         WHERE epoch_us(ws + INTERVAL '5 minutes') // 1000 <= wm.wm_ms
         ORDER BY 1, 2""",
    "s02_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events ORDER BY 1, 2""",
    // sessions: 30-min-gap batch sessionization; a user's LAST session
    // is withheld unless the final watermark STRICTLY passed its
    // timeout. Exact engine arithmetic (WatermarkBoundarySpec): the
    // watermark is floor-to-ms of max event time minus 1 h, the
    // registered timeout is ceil-to-ms of (last event + 30 min), and
    // the timeout fires only on wm > timeout — so the tail is withheld
    // iff ceil_ms(end)+1800000 >= floor_ms(max)-3600000. Every earlier
    // session emits in-batch regardless of the watermark.
    "s03_stream_sessions" ->
      """WITH marked AS (
           SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         numbered AS (
           SELECT user_id, ts,
             sum(new_session) OVER
               (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
           FROM marked),
         per AS (
           SELECT user_id, session_idx,
                  min(ts) AS s_start, max(ts) AS s_end,
                  count(*) AS n_events
           FROM numbered GROUP BY 1, 2),
         wm AS (
           SELECT epoch_us(max(ts)) // 1000 - 3600000 AS wm_ms FROM events),
         last AS (SELECT user_id, max(session_idx) AS mi FROM per GROUP BY 1)
         SELECT per.user_id,
                strftime(s_start, '%Y-%m-%d %H:%M:%S.%f') AS session_start,
                strftime(s_end, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
                n_events
         FROM per
         JOIN last ON per.user_id = last.user_id, wm
         WHERE NOT (session_idx = mi
                    AND (epoch_us(s_end) + 999) // 1000 + 1800000 >= wm.wm_ms)
         ORDER BY 1, 2""",
    // inner interval join: emission is complete on a finite feed, so
    // the replay is the plain batch join with the same time bounds
    "s04_stream_interval_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
                round(p.value, 4) AS value
         FROM events c
         JOIN events p ON c.user_id = p.user_id
          AND c.event_type = 'click' AND p.event_type = 'purchase'
          AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
         ORDER BY 1, 2, 3""",
    // both drops fit one AvailableNow micro-batch (maxFilesPerTrigger
    // 64), so every stored row carries batch 0's provenance stamp and
    // the cross-drop duplicate collapses to one identical row
    "s05_stream_ingest" ->
      """SELECT n_name AS identifier, n_nationkey AS nationkey,
                n_regionkey AS regionkey, 'stream-0' AS file_id
         FROM nation ORDER BY identifier""")
}
