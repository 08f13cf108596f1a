package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, PipelineContext}
import graft.storage.{Bm25Index, IvfIndex, MinHashIndex}

/** Size-tiered partial compaction across the persisted-index triad
  * (VERDICT r14 missing #1 / next #1): results must be INVARIANT
  * across partial merges, the compacted giant must never be
  * rewritten, tombstones and batch tags must survive verbatim, and
  * compaction output must keep the bloom sidecars its corpus opted
  * into (#7). */
class TieredCompactionSpec extends SparkTestBase {
  import spark.implicits._

  private def newDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-tier-$tag").toString

  // a text corpus whose per-append parquet footprint separates tiers:
  // the giant lands hundreds of multi-word docs, a small batch a
  // handful — more than a mergeFactor apart in bytes
  private def textDocs(ids: Range): DataFrame =
    ids.map(i => (i.toLong,
      s"document $i talks about topic${i % 7} and topic${i % 11} " +
        s"with shared vocabulary alpha beta gamma delta epsilon " +
        s"zeta eta theta iota kappa lambda mu token$i"))
      .toDF("doc_id", "text")

  test("MinHash: tier merges fold the small segments, never the giant; admission, selfPairs, liveDocIds and deletes are invariant") {
    val idx = new MinHashIndex(spark, newDir("mh"),
      shingle = Dedup.WordGrams(2), numHashes = 64, bands = 16,
      nBuckets = 8, idBloomMaxIds = 100000L)
    idx.append(textDocs(0 until 300), "doc_id", "text",
      batchTag = Some("giant"))
    val giant = idx.segments.head
    // per-trigger small appends, a takedown in the middle: the
    // manifest reads [giant][s1][s2][del][s3][s4]
    idx.append(textDocs(300 until 304), "doc_id", "text",
      batchTag = Some("s1"))
    idx.append(textDocs(304 until 308), "doc_id", "text",
      batchTag = Some("s2"))
    assert(idx.delete(Seq(301L, 305L).toDF("doc_id"), "doc_id",
      batchTag = Some("td")) === 2L)
    idx.append(textDocs(308 until 312), "doc_id", "text",
      batchTag = Some("s3"))
    // 301 re-appended AFTER its delete — a new live doc whose
    // liveness the splice must preserve
    idx.append(textDocs(312 until 316)
      .unionByName(textDocs(301 to 301)), "doc_id", "text",
      batchTag = Some("s4"))

    val incoming = textDocs(300 until 316)
      .select(($"doc_id" + 10000L).as("doc_id"), $"text")
    def probe(): Seq[Row] = PipelineContext.materialize { implicit ctx =>
      idx.dedupAgainst(incoming, "doc_id", "text", minJaccard = 0.4)
    }.orderBy("doc_id").collect().toSeq
    def pairs(): Seq[Row] = PipelineContext.materialize { implicit ctx =>
      idx.selfPairs(0.5)
    }.orderBy("id1", "id2").collect().toSeq
    val (probe0, pairs0) = (probe(), pairs())
    val live0 = idx.liveDocIds.collect().map(_.getLong(0)).sorted.toSeq

    // the merge plan must exclude the giant (it sits alone in its
    // size tier) and fold the four small segments — two runs split by
    // the tombstone, so two groups of two
    val plan = idx.tieredPlan(10)
    assert(plan.nonEmpty, "small per-trigger segments must plan a merge")
    assert(!plan.flatten.contains(giant), s"the giant must never merge: $plan")
    assert(plan.map(_.size).sum === 4 && plan.size === 2,
      s"two runs of two smalls each: $plan")

    val folded = idx.compactTiered(10)
    assert(folded === 4)
    assert(idx.segments.contains(giant),
      "the giant segment is carried VERBATIM — never rewritten")
    assert(idx.segments.count(_.startsWith("seg-")) === 3,
      s"giant + two merged: ${idx.segments}")
    assert(idx.segments.count(mf => mf.startsWith("del-")) === 1,
      "the tombstone is retained verbatim (folds only at full compact)")

    // result invariance: admission, pair query, membership
    assert(probe() === probe0)
    assert(pairs() === pairs0)
    assert(idx.liveDocIds.collect().map(_.getLong(0)).sorted.toSeq === live0)
    assert(live0.contains(301L), "the re-appended id stays live")
    assert(!live0.contains(305L), "the tombstoned id stays dead")
    // batch tags survive the merge (replay guard intact)
    assert(idx.committedBatchTags ===
      Set("giant", "s1", "s2", "td", "s3", "s4"))
    // blooms follow idBloomMaxIds onto merged output: a takedown of
    // ids absent from every segment prunes ALL scans
    assert(idx.deleteScanSegments(
      Seq(2000L, 3000L).toDF("doc_id"), "doc_id") === Nil)
    // a second tiered call has nothing in-tier to do (the two merged
    // segments now sit in a higher tier than any new small)
    assert(idx.compactTiered(10) === 0)
    // and the FULL compact still folds everything incl. the tombstone
    idx.compact()
    assert(idx.segments.size === 1)
    assert(probe() === probe0)
    assert(pairs() === pairs0)
  }

  test("BM25: tier merges preserve scores exactly through interleaved deletes; dfadj tombstones stay verbatim") {
    val idx = new Bm25Index(spark, newDir("bm"), nBuckets = 8,
      idBloomMaxIds = 100000L)
    // the giant must clear a full mergeFactor in BYTES: at test scale
    // parquet footer overhead dominates small bucketed files, so the
    // corpus is sized well past it
    idx.append(textDocs(0 until 2500), "doc_id", "text")
    val giant = idx.segments.head
    idx.append(textDocs(3000 until 3004), "doc_id", "text")
    idx.append(textDocs(3004 until 3008), "doc_id", "text")
    assert(idx.delete(Seq(10L, 3005L).toDF("doc_id"), "doc_id") === 2L)
    idx.append(textDocs(3008 until 3012), "doc_id", "text")
    idx.append(textDocs(3012 until 3016), "doc_id", "text")
    val queries = Seq((1L, "topic3 alpha token3010"), (2L, "beta token3005 topic5"))
    def score(): Seq[Row] =
      idx.topDocs(queries, k = 8).orderBy("qid", "rank").collect().toSeq
    val s0 = score()
    assert(s0.nonEmpty)
    val plan = idx.tieredPlan(10)
    assert(plan.nonEmpty && !plan.flatten.contains(giant), plan.toString)
    val folded = idx.compactTiered(10)
    assert(folded === 4)
    assert(idx.segments.contains(giant))
    assert(idx.segments.count(_.startsWith("del-")) === 1)
    assert(score() === s0)
    // the tombstoned doc stays dead, the id-range/bloom pruning of
    // the merged output works
    assert(idx.deleteScanSegments(
      Seq(5000L, 6000L).toDF("doc_id"), "doc_id") === Nil)
    // full compact afterwards: identical again, tombstones folded
    idx.compact()
    assert(idx.segments.size === 1)
    assert(score() === s0)
  }

  test("IVF: tier merges preserve topK exactly; an empty streaming append is probeable and merges away") {
    val rnd = new scala.util.Random(3)
    def vecs(ids: Range): DataFrame = ids.map { i =>
      (i.toLong, Seq.fill(8)(rnd.nextDouble() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val giantBatch = vecs(0 until 4000)
    val idx = new IvfIndex(spark, newDir("ivf"), nCells = 4,
      idBloomMaxIds = 100000L)
    idx.append(giantBatch, "vec_id", "embedding")
    val giant = idx.segments.head
    val smalls = Seq(vecs(4000 until 4004), vecs(4004 until 4008),
      vecs(4008 until 4012))
    smalls.foreach(b => idx.append(b, "vec_id", "embedding"))
    // the all-duplicate streaming micro-batch: an EMPTY append — must
    // commit schema-bearing (a fileless vectors/ dir would kill every
    // whole-index read below, the pre-r15 landmine)
    idx.append(vecs(0 until 0), "vec_id", "embedding")
    val emptySeg = idx.segments.last
    assert(idx.delete(Seq(5L, 4005L).toDF("vec_id"), "vec_id") === 2L)
    val q = vecs(0 until 2).toDF("qid", "qv")
    def top(): Seq[Row] = idx.topK(q, "qid", "qv", k = 6, nProbe = 4)
      .orderBy("qid", "rank").collect().toSeq
    val t0 = top() // exercises the empty segment read path too
    val plan = idx.tieredPlan(10)
    assert(plan.nonEmpty && !plan.flatten.contains(giant), plan.toString)
    val folded = idx.compactTiered(10)
    assert(folded >= 3, s"the small segments fold: $folded")
    assert(idx.segments.contains(giant))
    assert(top() === t0)
    // giant and merged output prune via range+bloom; the zero-doc
    // segment has no sidecar (null bounds) so it alone may still be
    // scanned until a later merge absorbs it — its scan is one empty
    // file
    assert(idx.deleteScanSegments(Seq(9000L, 9001L).toDF("vec_id"),
      "vec_id").toSet.subsetOf(Set(emptySeg)))
    idx.compact()
    assert(top() === t0)
    assert(idx.deleteScanSegments(
      Seq(9000L, 9001L).toDF("vec_id"), "vec_id") === Nil,
      "the full compact absorbs the sidecar-less empty segment")
  }

  test("blooms survive a FULL compact on all three indexes (r14 #7)") {
    import graft.storage.SegmentIdBloom
    // MinHash
    val mhDir = newDir("mhb")
    val mh = new MinHashIndex(spark, mhDir,
      shingle = Dedup.WordGrams(2), numHashes = 64, bands = 16,
      nBuckets = 8, idBloomMaxIds = 1000L)
    mh.append(textDocs(0 until 8), "doc_id", "text")
    mh.append(textDocs(8 until 16), "doc_id", "text")
    mh.compact()
    assert(SegmentIdBloom.read(new java.io.File(
      s"$mhDir/${mh.segments.head}")).isDefined,
      "MinHash compact output carries the bloom")
    // BM25
    val bmDir = newDir("bmb")
    val bm = new Bm25Index(spark, bmDir, nBuckets = 8,
      idBloomMaxIds = 1000L)
    bm.append(textDocs(0 until 8), "doc_id", "text")
    bm.append(textDocs(8 until 16), "doc_id", "text")
    bm.compact()
    assert(SegmentIdBloom.read(new java.io.File(
      s"$bmDir/${bm.segments.head}")).isDefined,
      "BM25 compact output carries the bloom")
    // IVF
    val ivDir = newDir("ivb")
    val iv = new IvfIndex(spark, ivDir, nCells = 2, idBloomMaxIds = 1000L)
    iv.append(Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding"), "vec_id", "embedding")
    iv.append(Seq((3L, Seq(1.0, 1.0)), (4L, Seq(0.5, 1.0)))
      .toDF("vec_id", "embedding"), "vec_id", "embedding")
    iv.compact()
    assert(SegmentIdBloom.read(new java.io.File(
      s"$ivDir/${iv.segments.head}")).isDefined,
      "IVF compact output carries the bloom")
    // the default-off handle still writes none anywhere
    val offDir = newDir("bmoff")
    val off = new Bm25Index(spark, offDir, nBuckets = 8)
    off.append(textDocs(0 until 8), "doc_id", "text")
    off.append(textDocs(8 until 16), "doc_id", "text")
    off.compact()
    assert(SegmentIdBloom.read(new java.io.File(
      s"$offDir/${off.segments.head}")).isEmpty)
  }

  test("BM25: an all-duplicate (empty) streaming micro-batch commits a probeable segment") {
    val dir = newDir("bm-empty")
    val idx = new Bm25Index(spark, dir, nBuckets = 8,
      idBloomMaxIds = 1000L)
    idx.append(textDocs(0 until 8), "doc_id", "text",
      batchTag = Some("b0"))
    val s0 = idx.topDocs(Seq((1L, "alpha topic3")), k = 4)
      .orderBy("qid", "rank").collect().toSeq
    idx.append(textDocs(0 until 0), "doc_id", "text",
      batchTag = Some("b1"))
    assert(idx.segments.size === 2, "the empty batch commits (its tag IS the replay guard)")
    assert(idx.committedBatchTags === Set("b0", "b1"))
    // the zero-doc segment is invisible in every read path — before
    // the r15 writeBucketed zero-guard this query DIED in parquet
    // schema inference on the fileless postings dir
    assert(idx.topDocs(Seq((1L, "alpha topic3")), k = 4)
      .orderBy("qid", "rank").collect().toSeq === s0)
    assert(idx.delete(Seq(3L).toDF("doc_id"), "doc_id") === 1L)
    idx.compact()
    assert(idx.committedBatchTags === Set("b0", "b1"))
  }
}
