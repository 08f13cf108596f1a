package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, PipelineContext}
import graft.storage.MinHashIndex

/** Persisted MinHash near-duplicate index: result parity against the
  * inline [[Dedup.dedupAgainst]] engine (the amortized existing side
  * must be INVISIBLE in results), lifecycle parity with the other two
  * persisted indexes (tombstones, replay guards, id-range pruning,
  * empty-compact), and the bucket-partition-pruning plan pin. */
class MinHashIndexSpec extends SparkTestBase {
  import spark.implicits._

  // existing corpus (even-ish ids) with exact dups, near dups and a
  // too-short doc; incoming batch probes all three classes
  private def existing: DataFrame = Seq(
    (2L, "the quick brown fox jumps over the lazy dog tonight"),
    (4L, "spark shuffles partition data across the cluster nodes"),
    (6L, "a wholly unrelated document about maritime navigation charts"),
    (8L, "the quick brown fox jumps over the lazy dog at dawn"),
    (10L, "short one"),
    (12L, "columnar storage formats compress repeated values efficiently"))
    .toDF("doc_id", "text")

  private def incoming: DataFrame = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup of 2
    (3L, "the quick brown fox jumps over the lazy dog at dusk"), // near dup of 2/8
    (5L, "entirely novel content on quantum error correction codes"),
    (7L, "spark shuffles partition data across the cluster machines"), // near dup of 4
    (9L, "short one"), // exact dup of 10 (too short to shingle)
    (11L, "another fresh document discussing medieval trade routes"))
    .toDF("doc_id", "text")

  private val mode: Dedup.ShingleMode = Dedup.WordGrams(2)

  private def newDir(): String =
    java.nio.file.Files.createTempDirectory("graft-mh").toString

  private def inline(in: DataFrame, ex: DataFrame, j: Double = 0.4): Seq[Row] =
    PipelineContext.materialize { implicit ctx =>
      Dedup.dedupAgainst(in, ex, "doc_id", "text", shingle = mode,
        numHashes = 64, bands = 16, minJaccard = j)
    }.orderBy("doc_id").collect().toSeq

  private def probe(idx: MinHashIndex, in: DataFrame,
      j: Double = 0.4): Seq[Row] =
    PipelineContext.materialize { implicit ctx =>
      idx.dedupAgainst(in, "doc_id", "text", minJaccard = j)
    }.orderBy("doc_id").collect().toSeq

  test("segmented incremental index admits exactly what the inline engine admits") {
    val idx = new MinHashIndex(spark, newDir(), shingle = mode,
      numHashes = 64, bands = 16, nBuckets = 8)
    idx.append(existing.filter($"doc_id" <= 6), "doc_id", "text")
    idx.append(existing.filter($"doc_id" > 6), "doc_id", "text")
    assert(idx.segments.size === 2)
    val got = probe(idx, incoming)
    assert(got === inline(incoming, existing))
    // the survivors are the genuinely-new docs, in the original schema
    assert(got.map(_.getLong(0)) === Seq(3L, 5L, 11L) ||
      got.map(_.getLong(0)).toSet.subsetOf(Set(3L, 5L, 7L, 11L)),
      s"unexpected survivor set: $got")
    // exact dups (1, 9 — including the unshingleable short doc) and the
    // high-overlap near dup (7) must be gone
    val ids = got.map(_.getLong(0)).toSet
    assert(!ids.contains(1L) && !ids.contains(9L), s"exact dups survived: $ids")
  }

  test("threshold sweep matches inline at every theta") {
    val idx = new MinHashIndex(spark, newDir(), shingle = mode,
      numHashes = 64, bands = 16, nBuckets = 8)
    idx.append(existing, "doc_id", "text")
    Seq(0.2, 0.4, 0.6, 0.9).foreach { j =>
      assert(probe(idx, incoming, j) === inline(incoming, existing, j),
        s"divergence at theta=$j")
    }
  }

  test("delete tombstones probe-identically to an index rebuilt without the docs") {
    val dir = newDir()
    val idx = new MinHashIndex(spark, dir, shingle = mode,
      numHashes = 64, bands = 16, nBuckets = 8)
    idx.append(existing, "doc_id", "text")
    // tombstone the near-dup cluster anchor and the short doc
    assert(idx.delete(Seq(2L, 10L).toDF("doc_id"), "doc_id") === 2L)
    val survivors = existing.filter(!$"doc_id".isin(2L, 10L))
    assert(probe(idx, incoming) === inline(incoming, survivors))
    // deleting an absent / already-dead id is a zero no-op
    assert(idx.delete(Seq(2L, 999L).toDF("doc_id"), "doc_id") === 0L)
    // compact folds the tombstone physically; results unchanged
    idx.compact()
    assert(idx.segments.size === 1 &&
      !idx.segments.head.startsWith("del-"))
    assert(probe(idx, incoming) === inline(incoming, survivors))
    // a re-append of a deleted id is a NEW live doc (manifest order)
    idx.append(existing.filter($"doc_id" === 2L), "doc_id", "text")
    assert(probe(idx, incoming) ===
      inline(incoming, existing.filter($"doc_id" =!= 10L)))
  }

  test("batch tags make replayed appends and deletes no-ops, surviving compaction") {
    val idx = new MinHashIndex(spark, newDir(), shingle = mode,
      numHashes = 64, bands = 16, nBuckets = 8)
    idx.append(existing, "doc_id", "text", batchTag = Some("b1"))
    val want = probe(idx, incoming)
    // replayed append: no new segment, results unchanged
    idx.append(existing, "doc_id", "text", batchTag = Some("b1"))
    assert(idx.segments.size === 1)
    assert(probe(idx, incoming) === want)
    // tagged delete, then replay across a compact: the guard must
    // survive the rewrite (tags union forward) — without it the
    // replayed delete would re-tombstone the re-appended doc
    assert(idx.delete(Seq(2L).toDF("doc_id"), "doc_id",
      batchTag = Some("d1")) === 1L)
    idx.compact()
    idx.append(existing.filter($"doc_id" === 2L), "doc_id", "text")
    val afterReappend = probe(idx, incoming)
    assert(idx.delete(Seq(2L).toDF("doc_id"), "doc_id",
      batchTag = Some("d1")) === 0L)
    assert(probe(idx, incoming) === afterReappend)
    assert(idx.committedBatchTags === Set("b1", "d1"))
  }

  test("delete scans only segments whose id range overlaps the requested ids") {
    val idx = new MinHashIndex(spark, newDir(), shingle = mode,
      numHashes = 64, bands = 16, nBuckets = 8)
    idx.append(existing.filter($"doc_id" <= 6), "doc_id", "text") // ids 2..6
    idx.append(existing.filter($"doc_id" > 6), "doc_id", "text") // ids 8..12
    val segs = idx.segments
    // a takedown of low ids must skip the high segment, and vice versa
    assert(idx.deleteScanSegments(Seq(3L, 4L).toDF("doc_id"), "doc_id")
      === Seq(segs(0)))
    assert(idx.deleteScanSegments(Seq(11L).toDF("doc_id"), "doc_id")
      === Seq(segs(1)))
    assert(idx.deleteScanSegments(Seq(100L).toDF("doc_id"), "doc_id")
      === Nil)
  }

  test("deleting every doc then compacting yields the EMPTY index; appends restart it") {
    val idx = new MinHashIndex(spark, newDir(), shingle = mode,
      numHashes = 64, bands = 16, nBuckets = 8)
    idx.append(existing, "doc_id", "text")
    assert(idx.delete(existing.select($"doc_id"), "doc_id") === 6L)
    idx.compact()
    assert(idx.segments.isEmpty)
    // empty head: probe fails loudly (same contract as the other indexes)
    val e = intercept[IllegalArgumentException] {
      probe(idx, incoming)
    }
    assert(e.getMessage.contains("empty MinHash index"))
    idx.append(existing, "doc_id", "text")
    assert(probe(idx, incoming) === inline(incoming, existing))
  }

  test("banded scans carry the literal bucket partition filter (pruning pin)") {
    val dir = newDir()
    val idx = new MinHashIndex(spark, dir, shingle = mode,
      numHashes = 64, bands = 16, nBuckets = 8)
    idx.append(existing, "doc_id", "text")
    // one incoming doc → ≤ 16 band keys → a strict subset of the 8
    // buckets is possible; the plan must show partition filters on the
    // banded scans either way, and when the probed set IS a subset the
    // untouched partitions must not be read
    val one = incoming.filter($"doc_id" === 3L)
    PipelineContext.run { implicit ctx =>
      val buckets = idx.probeBuckets(one, "doc_id", "text")
      assert(buckets.nonEmpty && buckets.size <= 8)
      // bandedScan is the exact frame dedupAgainst probes candidates
      // from (shared method — the pin covers the production path; the
      // full operator stages it behind a checkpoint leaf, which would
      // hide the scan from the outer plan)
      val plan = idx.bandedScan(buckets)
        .queryExecution.executedPlan.toString
      val bandedScans = plan.linesIterator
        .filter(l => l.contains("/banded")).toSeq
      assert(bandedScans.nonEmpty, s"no banded scan in plan:\n$plan")
      assert(bandedScans.forall(_.contains("PartitionFilters: [")), plan)
      assert(bandedScans.forall(l =>
        buckets.forall(b => l.contains(b.toString))),
        s"expected literal bucket set $buckets in:\n${bandedScans.mkString("\n")}")
      // and the results with the pruned scan equal the inline engine
      assert(probe(idx, one) === inline(one, existing))
    }
  }

  test("opt-in id blooms prune range-overlapped segments on scattered takedowns") {
    // two segments with INTERLEAVED id ranges: the range sidecar keeps
    // both for any in-range takedown; the bloom skips by content
    def seed(bloomCap: Long): MinHashIndex = {
      val idx = new MinHashIndex(spark, newDir(), shingle = mode,
        numHashes = 64, bands = 16, nBuckets = 8, idBloomMaxIds = bloomCap)
      idx.append(existing.filter($"doc_id".isin(2L, 6L, 10L)),
        "doc_id", "text") // range [2, 10]
      idx.append(existing.filter($"doc_id".isin(4L, 8L, 12L)),
        "doc_id", "text") // range [4, 12] — overlaps
      idx
    }
    val withBloom = seed(1000000L)
    val segs = withBloom.segments
    // 8 sits inside BOTH ranges but only segment 2 holds it
    assert(withBloom.deleteScanSegments(Seq(8L).toDF("doc_id"), "doc_id")
      === Seq(segs(1)))
    // a scattered id in NEITHER segment prunes everything by content
    assert(withBloom.deleteScanSegments(Seq(5L).toDF("doc_id"), "doc_id")
      === Nil)
    // pruning is invisible in results: the delete still lands and the
    // probe matches the inline engine over the survivors
    assert(withBloom.delete(Seq(8L).toDF("doc_id"), "doc_id") === 1L)
    assert(probe(withBloom, incoming) ===
      inline(incoming, existing.filter($"doc_id" =!= 8L)))
    // default handle (blooms off): the range alone keeps both segments
    val noBloom = seed(0L)
    assert(noBloom.deleteScanSegments(Seq(8L).toDF("doc_id"), "doc_id")
      === noBloom.segments)
  }

  test("unshingleable docs dedup via exh; an ALL-short append cannot poison the index") {
    // 1-word docs yield NO WordGrams(2) shingles: sig/sh are NULL and
    // the batch's banded table is EMPTY — the write must still leave a
    // schema-bearing dir (the r13 zero-row-segment trap, here on the
    // banded table) or every later probe dies in parquet inference
    val idx = new MinHashIndex(spark, newDir(), shingle = mode,
      numHashes = 64, bands = 16, nBuckets = 8)
    val shorts = Seq((2L, "zebra"), (4L, "crocodile")).toDF("doc_id", "text")
    idx.append(shorts, "doc_id", "text") // all-unshingleable segment
    idx.append(existing.filter($"doc_id" === 6L), "doc_id", "text")
    val in = Seq(
      (1L, "zebra"), // exact dup of an unshingleable doc → exh-only drop
      (3L, "a wholly unrelated document about maritime navigation maps"),
      (5L, "gnu")) // unshingleable AND novel → survives
      .toDF("doc_id", "text")
    val ex = shorts.unionByName(existing.filter($"doc_id" === 6L))
    def check(): Unit = {
      val got = PipelineContext.materialize { implicit ctx =>
        idx.dedupAgainst(in, "doc_id", "text", minJaccard = 0.4)
      }.orderBy("doc_id").collect().toSeq
      assert(got === inline(in, ex))
      assert(got.map(_.getLong(0)) === Seq(5L)) // 1 exact, 3 near dup of 6
    }
    check()
    // compact folds the fileless-banded segment and must stay probeable
    idx.compact()
    assert(idx.segments.size === 1)
    check()
    // an index whose EVERY live doc is unshingleable still probes
    val idx2 = new MinHashIndex(spark, newDir(), shingle = mode,
      numHashes = 64, bands = 16, nBuckets = 8)
    idx2.append(shorts, "doc_id", "text")
    val got2 = PipelineContext.materialize { implicit ctx =>
      idx2.dedupAgainst(in, "doc_id", "text", minJaccard = 0.4)
    }.orderBy("doc_id").collect().toSeq
    assert(got2 === inline(in, shorts))
    assert(got2.map(_.getLong(0)) === Seq(3L, 5L)) // only the exact dup drops
  }

  test("selfPairs over stored state equals the inline minhashPairs engine") {
    def inlinePairs(docs: DataFrame): Seq[Row] =
      PipelineContext.materialize { implicit ctx =>
        Dedup.minhashPairs(docs, "doc_id", "text", shingle = mode,
          numHashes = 64, bands = 16, minJaccard = Some(0.4))
      }.orderBy("id1", "id2").collect().toSeq
    val idx = new MinHashIndex(spark, newDir(), shingle = mode,
      numHashes = 64, bands = 16, nBuckets = 8)
    idx.append(existing.filter($"doc_id" <= 6), "doc_id", "text")
    idx.append(existing.filter($"doc_id" > 6), "doc_id", "text")
    def pairs(): Seq[Row] = PipelineContext.materialize { implicit ctx =>
      idx.selfPairs(0.4)
    }.orderBy("id1", "id2").collect().toSeq
    val got = pairs()
    assert(got === inlinePairs(existing))
    assert(got.nonEmpty) // the fixture plants the (2, 8) near-dup pair
    // tombstones fold into the corpus-wide query too
    assert(idx.delete(Seq(2L).toDF("doc_id"), "doc_id") === 1L)
    assert(pairs() === inlinePairs(existing.filter($"doc_id" =!= 2L)))
  }

  test("a fully-tombstoned compact is a new generation: the batch-tag surface resets") {
    val idx = new MinHashIndex(spark, newDir(), shingle = mode,
      numHashes = 64, bands = 16, nBuckets = 8)
    idx.append(existing, "doc_id", "text", batchTag = Some("gen1:b0"))
    assert(idx.committedBatchTags === Set("gen1:b0"))
    assert(idx.delete(existing.select($"doc_id"), "doc_id") === 6L)
    idx.compact()
    // the empty manifest names no tag carrier — documented trade: a
    // pre-teardown tag replayed afterwards re-admits into the
    // deliberately-emptied index (new-to-the-empty-corpus semantics)
    assert(idx.segments.isEmpty)
    assert(idx.committedBatchTags === Set.empty[String])
    idx.append(existing, "doc_id", "text", batchTag = Some("gen1:b0"))
    assert(idx.segments.size === 1)
    assert(probe(idx, incoming) === inline(incoming, existing))
  }

  test("an ALL-DUPLICATE micro-batch (empty append) still commits; the index probes and compacts (ADVICE r14)") {
    // the s08 streaming loop's edge: every incoming doc deduped away →
    // append() sees ZERO rows but must still commit (the batchTag is
    // the replay guard — skipping the commit would re-admit the batch
    // on a checkpoint replay). Blooms opted in: the bloom writer must
    // no-op on the empty batch, not die or write an empty-filter file.
    val idx = new MinHashIndex(spark, newDir(), shingle = mode,
      numHashes = 64, bands = 16, nBuckets = 8, idBloomMaxIds = 1000L)
    idx.append(existing, "doc_id", "text", batchTag = Some("b0"))
    idx.append(existing.limit(0), "doc_id", "text", batchTag = Some("b1"))
    assert(idx.segments.size === 2, "the empty batch commits a segment")
    assert(idx.committedBatchTags === Set("b0", "b1"),
      "the empty batch's tag IS the replay guard")
    // the zero-doc segment is invisible in every read path: admission,
    // membership, deletes (its null-bounds id range never wrote a
    // sidecar → always scanned → zero rows contributed)
    assert(probe(idx, incoming) === inline(incoming, existing))
    assert(idx.liveDocIds.count() === 6L)
    assert(idx.delete(Seq(12L).toDF("doc_id"), "doc_id") === 1L)
    idx.compact()
    assert(idx.segments.size === 1)
    assert(idx.committedBatchTags === Set("b0", "b1"),
      "tags union forward through the compact")
    assert(probe(idx, incoming) ===
      inline(incoming, existing.filter($"doc_id" =!= 12L)))
  }

  test("dedupMaintenance end state ≡ an index REBUILT from the kept corpus, across a pre-existing tombstone (r15)") {
    val idx = new MinHashIndex(spark, newDir(), shingle = mode,
      numHashes = 64, bands = 16, nBuckets = 8)
    // the full 12-doc corpus (both fixture halves), then a takedown
    // BEFORE maintenance: 8 is already tombstoned, so it must neither
    // drop a live doc nor be kept as a representative
    idx.append(existing, "doc_id", "text")
    idx.append(incoming, "doc_id", "text")
    assert(idx.delete(Seq(8L).toDF("doc_id"), "doc_id") === 1L)
    val nDropped = PipelineContext.run { implicit ctx =>
      idx.dedupMaintenance(minJaccard = 0.4, batchTag = Some("m1"))
    }
    assert(nDropped > 0L, "the fixture has near-dup clusters to fold")
    val liveA = idx.liveDocIds.collect().map(_.getLong(0)).sorted.toSeq
    // keep-min-id per component: every dropped id has a smaller live
    // representative it pairs with transitively; 8 stayed dead
    assert(!liveA.contains(8L))
    assert(liveA.contains(1L), "cluster minima are kept")
    // REBUILD from exactly the kept docs — the end-state oracle
    val kept = existing.unionByName(incoming)
      .filter(col("doc_id").isin(liveA: _*))
    val rebuilt = new MinHashIndex(spark, newDir(), shingle = mode,
      numHashes = 64, bands = 16, nBuckets = 8)
    rebuilt.append(kept, "doc_id", "text")
    assert(rebuilt.liveDocIds.collect().map(_.getLong(0)).sorted.toSeq
      === liveA)
    // probe scores: admission against the maintained index equals
    // admission against the rebuilt one, for a batch that probes
    // every class (exact dup of a kept doc, near dup of a dropped
    // doc's representative, novel)
    val probeBatch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog tonight"),
      (103L, "the quick brown fox jumps over the lazy dog at dusk"),
      (105L, "entirely new material about glacier formation dynamics"))
      .toDF("doc_id", "text")
    def admit(i: MinHashIndex): Seq[Row] =
      PipelineContext.materialize { implicit ctx =>
        i.dedupAgainst(probeBatch, "doc_id", "text", minJaccard = 0.4)
      }.orderBy("doc_id").collect().toSeq
    assert(admit(idx) === admit(rebuilt))
    // after maintenance the live corpus is pairwise below θ — the
    // fixpoint a weekly job converges to
    assert(PipelineContext.materialize { implicit ctx =>
      idx.selfPairs(0.4)
    }.isEmpty)
    // the batchTag makes the whole job replay-safe: a second call is
    // a pre-pair-computation no-op
    assert(PipelineContext.run { implicit ctx =>
      idx.dedupMaintenance(minJaccard = 0.4, batchTag = Some("m1"))
    } === 0L)
  }

  test("a mismatched-params handle fails loudly instead of probing garbage") {
    val dir = newDir()
    val idx = new MinHashIndex(spark, dir, shingle = mode,
      numHashes = 64, bands = 16, nBuckets = 8)
    idx.append(existing, "doc_id", "text")
    val other = new MinHashIndex(spark, dir, shingle = Dedup.CharGrams(5),
      numHashes = 64, bands = 16, nBuckets = 8)
    val e = intercept[IllegalArgumentException] {
      other.append(incoming, "doc_id", "text")
    }
    assert(e.getMessage.contains("params"))
    val e2 = intercept[IllegalArgumentException] {
      PipelineContext.materialize { implicit ctx =>
        other.dedupAgainst(incoming, "doc_id", "text")
      }
    }
    assert(e2.getMessage.contains("params"))
  }
}
