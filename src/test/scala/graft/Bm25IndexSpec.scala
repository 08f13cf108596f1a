package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.operators.{CurationPipeline, PipelineContext}
import graft.storage.{Bm25Index, CasFiles, CommitConflictException}

class Bm25IndexSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus: DataFrame = Seq(
    (1L, "dup dup join scan"),
    (2L, "hash table scan join"),
    (3L, "spark window agg window"),
    (4L, "dup table"),
    (5L, "join join join hash"),
    (6L, "scan scan scan scan scan"),
    (7L, "window dup spark"),
    (8L, "agg hash window table")).toDF("doc_id", "text")

  private val queries = Seq((1L, "dup join"), (2L, "hash scan"))

  private def newIndexDir(): String =
    java.nio.file.Files.createTempDirectory("graft-bm25").toString

  private def inline(docs: DataFrame): Seq[Row] =
    PipelineContext.materialize { implicit ctx =>
      CurationPipeline.bm25TopDocs(docs, "doc_id", "text",
        queries.toDF("qid", "qtext"), "qid", "qtext", k = 5)
    }.orderBy("qid", "rank").collect().toSeq

  test("segmented incremental build scores identically to the inline single-pass build") {
    val idx = new Bm25Index(spark, newIndexDir(), nBuckets = 8)
    idx.append(corpus.filter($"doc_id" <= 5), "doc_id", "text")
    idx.append(corpus.filter($"doc_id" > 5), "doc_id", "text")
    // segment names are writer-unique (version prefix + random token)
    assert(idx.segments.size === 2)
    assert(idx.segments(0).startsWith("seg-1-"))
    assert(idx.segments(1).startsWith("seg-2-"))
    assert(idx.segments.distinct.size === 2)
    val got = idx.topDocs(queries, k = 5).orderBy("qid", "rank").collect().toSeq
    assert(got === inline(corpus))
    assert(got.nonEmpty)
  }

  test("bucket partition pruning: the postings scan reads only the query terms' buckets") {
    val dir = newIndexDir()
    val idx = new Bm25Index(spark, dir, nBuckets = 8)
    idx.append(corpus, "doc_id", "text")
    val plan = idx.topDocs(Seq((1L, "dup")), k = 3)
      .queryExecution.executedPlan.toString
    val b = Bm25Index.bucketOf("dup", 8).toInt
    // every index scan (postings AND dfreq) carries the literal bucket
    // partition filter — the pruning that makes query cost ∝ matched
    // buckets, not index size
    val filters = plan.linesIterator
      .filter(l => l.contains("/postings") || l.contains("/dfreq")).toSeq
    assert(filters.size >= 2, s"expected pruned scans in plan:\n$plan")
    assert(filters.forall(_.contains(s"bucket#")), plan)
    assert(filters.forall(_.matches(s".*PartitionFilters: \\[[^\\]]*= $b\\).*")),
      s"expected literal bucket=$b partition filters:\n${filters.mkString("\n")}")
    // NOTHING in the query path scans O(corpus): doc length is
    // denormalized onto the posting rows, so no doclen table exists —
    // and every file scan in the executed plan is one of the two
    // bucket-pruned segment tables
    assert(!plan.contains("doclen"),
      s"query plan must not touch a corpus-wide doclen table:\n$plan")
    val scans = plan.linesIterator.filter(_.contains("FileScan")).toSeq
    assert(scans.nonEmpty)
    assert(scans.forall(l => l.contains("/postings") || l.contains("/dfreq")),
      s"unexpected unpruned file scan:\n${scans.mkString("\n")}")
    // the driver-side bucket replica agrees with the engine's pmod
    val engineBucket = corpus.sparkSession.range(1)
      .select(pmod(xxhash64(lit("dup")), lit(8L)).cast("int"))
      .as[Int].head()
    assert(b === engineBucket)
  }

  test("dfCap drops whale terms from postings but keeps document length exact") {
    val dir = newIndexDir()
    val idx = new Bm25Index(spark, dir, nBuckets = 4)
    // 'scan' appears in 3 docs (1, 2, 6); cap at 2 drops it
    idx.append(corpus, "doc_id", "text", dfCap = 2L)
    val got = idx.topDocs(Seq((1L, "scan dup")), k = 8)
      .orderBy("rank").collect().toSeq
    // only 'dup' scores: doc 6 (scan-only) must be absent
    assert(!got.exists(_.getLong(1) === 6L))
    assert(got.map(_.getLong(1)).toSet.subsetOf(Set(1L, 4L, 7L)))
    // dl stayed un-capped: stats file counts ALL tokens of doc 6
    val stats = idx.segments.map { s =>
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, s, "_stats")), "UTF-8").trim.split(" ")
    }
    assert(stats.map(_(1).toLong).sum ===
      corpus.select(sum(size(split($"text", " ")))).as[Long].head())
  }

  test("losing the manifest CAS raises CommitConflictException, removes ONLY the loser's segment") {
    val dir = newIndexDir()
    val idx = new Bm25Index(spark, dir, nBuckets = 4)
    idx.append(corpus.filter($"doc_id" <= 4), "doc_id", "text")
    val first = idx.segments.head
    // The foreign writer's v2 names a REAL directory it built under
    // its own writer-unique name — the loser's rollback must not touch
    // it (the pre-unique-naming design deleted the deterministic
    // seg-<v+1>, i.e. the winner's published data).
    val foreignSeg = new java.io.File(dir, "seg-2-foreignwriter")
    java.nio.file.Files.createDirectories(foreignSeg.toPath)
    java.nio.file.Files.write(new java.io.File(foreignSeg, "_stats").toPath,
      "1 1\n".getBytes("UTF-8"))
    // The foreign manifest lands from INSIDE the batch evaluation —
    // deterministically after this append read head=v1 and before its
    // CAS, the exact window the protocol must lose in (the GraphStore
    // race-spec pattern).
    val foreign = new java.io.File(dir, "_manifest.v2")
    val body = s"$first\nseg-2-foreignwriter\n"
    val trapped = corpus.filter($"doc_id" > 4).as[(Long, String)]
      .mapPartitions { it =>
        CasFiles.putIfAbsent(foreign, body.getBytes("UTF-8")); it
      }.toDF("doc_id", "text")
    intercept[CommitConflictException] {
      idx.append(trapped, "doc_id", "text")
    }
    val segDirs = Option(new java.io.File(dir).list()).toSeq.flatten
      .filter(_.startsWith("seg-")).toSet
    assert(segDirs === Set(first, "seg-2-foreignwriter"),
      "loser must clean up its own segment and ONLY its own segment")
    assert(idx.segments === Seq(first, "seg-2-foreignwriter"))
  }

  test("compact folds segments into one with identical scores; vacuum honors current+previous retention") {
    val dir = newIndexDir()
    val idx = new Bm25Index(spark, dir, nBuckets = 8)
    idx.append(corpus.filter($"doc_id" <= 3), "doc_id", "text")
    idx.append(corpus.filter($"doc_id" > 3 && $"doc_id" <= 6), "doc_id", "text")
    val preCompact = idx.segments
    val expect = inline(corpus)
    idx.compact()
    assert(idx.segments.size === 1)
    assert(idx.segments.head.startsWith("seg-3-"))
    // superseded segments stay for in-flight readers: the retention
    // window is current + previous, so vacuum right after the compact
    // removes nothing
    assert(idx.vacuum() === Nil)
    assert(new java.io.File(dir, preCompact.head).exists())
    // the next commit pushes the pre-compact segments out of the window
    idx.append(corpus.filter($"doc_id" > 6), "doc_id", "text")
    assert(idx.vacuum() === preCompact.sorted)
    assert(!new java.io.File(dir, preCompact.head).exists())
    assert(!new java.io.File(dir, "_manifest.v1").exists())
    assert(idx.segments.size === 2)
    assert(idx.segments.last.startsWith("seg-4-"))
    assert(idx.topDocs(queries, k = 5).orderBy("qid", "rank")
      .collect().toSeq === expect)
  }

  test("a committed batch tag makes replayed appends no-ops, surviving compaction") {
    val dir = newIndexDir()
    val idx = new Bm25Index(spark, dir, nBuckets = 8)
    val b0 = corpus.filter($"doc_id" <= 4)
    val b1 = corpus.filter($"doc_id" > 4)
    idx.append(b0, "doc_id", "text", batchTag = Some("q:0"))
    val before = idx.topDocs(queries, k = 5).orderBy("qid", "rank")
      .collect().toSeq
    // an at-least-once replay of the SAME micro-batch is a no-op:
    // one segment, unchanged scores — not a tf/df/stats double count
    idx.append(b0, "doc_id", "text", batchTag = Some("q:0"))
    assert(idx.segments.size === 1)
    assert(idx.committedBatchTags === Set("q:0"))
    assert(idx.topDocs(queries, k = 5).orderBy("qid", "rank")
      .collect().toSeq === before)
    // tags survive compaction: the merged segment inherits them
    idx.append(b1, "doc_id", "text", batchTag = Some("q:1"))
    idx.compact()
    assert(idx.segments.size === 1)
    assert(idx.committedBatchTags === Set("q:0", "q:1"))
    idx.append(b1, "doc_id", "text", batchTag = Some("q:1")) // replay post-compact
    assert(idx.segments.size === 1)
    assert(idx.topDocs(queries, k = 5).orderBy("qid", "rank")
      .collect().toSeq === inline(corpus))
    // untagged appends keep their original always-append semantics
    idx.append(Seq((9L, "join scan")).toDF("doc_id", "text"), "doc_id", "text")
    assert(idx.segments.size === 2)
  }

  test("foreachBatch streaming append: batched ingest converges to the inline scores") {
    val dir = newIndexDir()
    val idx = new Bm25Index(spark, dir, nBuckets = 8)
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) idx.append(batch, "doc_id", "text")
      }
      .start()
    try {
      mem.addData(corpus.as[(Long, String)].collect().filter(_._1 <= 3).toSeq: _*)
      q.processAllAvailable()
      mem.addData(corpus.as[(Long, String)].collect().filter(_._1 > 3).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(idx.segments.size === 2)
    assert(idx.topDocs(queries, k = 5).orderBy("qid", "rank").collect().toSeq
      === inline(corpus))
  }

  test("delete scans only segments whose id range overlaps the requested ids (r14 pin)") {
    val dir = newIndexDir()
    val idx = new Bm25Index(spark, dir, nBuckets = 8)
    idx.append(corpus.filter($"doc_id" <= 4), "doc_id", "text")
    idx.append(corpus.filter($"doc_id" > 4), "doc_id", "text")
    val Seq(segLow, segHigh) = idx.segments
    // a delete of low ids must not read the high segment, and vice
    // versa — the _idrange sidecar's whole point (the r13 documented
    // takedown read bill)
    assert(idx.deleteScanSegments(Seq(2L, 3L).toDF("doc_id"), "doc_id")
      === Seq(segLow))
    assert(idx.deleteScanSegments(Seq(7L).toDF("doc_id"), "doc_id")
      === Seq(segHigh))
    // ids outside every range scan nothing; empty set scans nothing
    assert(idx.deleteScanSegments(Seq(99L).toDF("doc_id"), "doc_id") === Nil)
    assert(idx.deleteScanSegments(Seq.empty[Long].toDF("doc_id"), "doc_id")
      === Nil)
    assert(idx.delete(Seq(99L).toDF("doc_id"), "doc_id") === 0L)
    // the caller's id TYPE is normalized against the postings schema
    // (ADVICE r13): string ids parse into the long postings ids and
    // match exactly — not silently zero
    assert(idx.deleteScanSegments(Seq("7").toDF("doc_id"), "doc_id")
      === Seq(segHigh))
    assert(idx.delete(Seq("7").toDF("doc_id"), "doc_id") === 1L)
    // post-delete scores still match a rebuilt index without the doc
    val rebuilt = new Bm25Index(spark, newIndexDir(), nBuckets = 8)
    rebuilt.append(corpus.filter($"doc_id" =!= 7L), "doc_id", "text")
    assert(idx.topDocs(queries, k = 5).orderBy("qid", "rank").collect().toSeq
      === rebuilt.topDocs(queries, k = 5).orderBy("qid", "rank").collect().toSeq)
    // compaction carries a (unioned) range forward: still prunable
    idx.compact()
    val Seq(merged) = idx.segments
    assert(idx.deleteScanSegments(Seq(99L).toDF("doc_id"), "doc_id") === Nil)
    assert(idx.deleteScanSegments(Seq(1L).toDF("doc_id"), "doc_id")
      === Seq(merged))
    // a segment WITHOUT the sidecar (pre-r14 layout) is always scanned
    new java.io.File(s"$dir/$merged", "_idrange").delete()
    assert(idx.deleteScanSegments(Seq(99L).toDF("doc_id"), "doc_id")
      === Seq(merged))
  }

  test("opt-in id blooms prune range-overlapped segments on scattered takedowns") {
    // interleaved id ranges: [1,7] odd and [2,8] even overlap fully, so
    // the range sidecar never prunes an in-range takedown — the bloom
    // skips by content ([[SegmentIdBloom]], opt-in per handle)
    def seed(bloomCap: Long): Bm25Index = {
      val idx = new Bm25Index(spark, newIndexDir(), nBuckets = 8,
        idBloomMaxIds = bloomCap)
      idx.append(corpus.filter($"doc_id" % 2 === 1), "doc_id", "text")
      idx.append(corpus.filter($"doc_id" % 2 === 0), "doc_id", "text")
      idx
    }
    val withBloom = seed(1000000L)
    val Seq(segOdd, segEven) = withBloom.segments
    assert(withBloom.deleteScanSegments(Seq(4L).toDF("doc_id"), "doc_id")
      === Seq(segEven))
    assert(withBloom.deleteScanSegments(Seq(5L).toDF("doc_id"), "doc_id")
      === Seq(segOdd))
    // pruning stays invisible: post-delete scores equal a rebuild
    assert(withBloom.delete(Seq(4L).toDF("doc_id"), "doc_id") === 1L)
    val rebuilt = new Bm25Index(spark, newIndexDir(), nBuckets = 8)
    rebuilt.append(corpus.filter($"doc_id" =!= 4L), "doc_id", "text")
    assert(withBloom.topDocs(queries, k = 5).orderBy("qid", "rank")
      .collect().toSeq ===
      rebuilt.topDocs(queries, k = 5).orderBy("qid", "rank")
        .collect().toSeq)
    // the default handle writes no blooms: range alone keeps both
    val noBloom = seed(0L)
    assert(noBloom.deleteScanSegments(Seq(4L).toDF("doc_id"), "doc_id")
      === noBloom.segments)
  }

  test("deleting every doc then compacting yields the EMPTY index; appends restart it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-allgone").toString
    val idx = new graft.storage.Bm25Index(spark, dir, nBuckets = 8)
    val v1 = Seq((1L, "dup join"), (2L, "hash scan")).toDF("doc_id", "text")
    idx.append(v1, "doc_id", "text")
    assert(idx.delete(Seq(1L, 2L).toDF("doc_id"), "doc_id") === 2L)
    // fully tombstoned but un-compacted: queries return empty, loudly
    // consistent (no NaN scores from a zero avgdl)
    assert(idx.topDocs(Seq((1L, "dup")), k = 3).collect().isEmpty)
    idx.compact()
    // the empty index, not a zero-row segment: same state as never
    // having appended — and the next append starts a fresh lineage
    assert(idx.segments.isEmpty)
    intercept[IllegalArgumentException](idx.topDocs(Seq((1L, "dup")), k = 3))
    idx.append(Seq((3L, "dup merge")).toDF("doc_id", "text"), "doc_id", "text")
    val got = idx.topDocs(Seq((1L, "dup")), k = 3).collect()
    assert(got.length === 1 && got(0).getLong(1) === 3L)
  }
}
