package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.storage.{CasFiles, CommitConflictException, IvfIndex}

class IvfIndexSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic pseudo-random unit-ish vectors, 64 of them in 8-dim
  private def corpus: DataFrame = {
    val rnd = new scala.util.Random(7)
    (0L until 64L).map { id =>
      id -> Seq.fill(8)(rnd.nextGaussian())
    }.toDF("vec_id", "embedding")
  }

  private def queriesDf: DataFrame = corpus.filter($"vec_id" < 3)
    .select($"vec_id".as("qid"), $"embedding".as("qv"))

  private def newIndexDir(): String =
    java.nio.file.Files.createTempDirectory("graft-ivf").toString

  test("full-probe query over a two-append build is row-identical to brute force") {
    val idx = new IvfIndex(spark, newIndexDir(), nCells = 4)
    idx.append(corpus.filter($"vec_id" % 4 < 3), "vec_id", "embedding")
    idx.append(corpus.filter($"vec_id" % 4 === 3), "vec_id", "embedding")
    // segment names are writer-unique (version prefix + random token)
    assert(idx.segments.size === 2)
    assert(idx.segments(0).startsWith("seg-1-"))
    assert(idx.segments(1).startsWith("seg-2-"))
    val got = idx.topK(queriesDf, "qid", "qv", k = 5, nProbe = 4,
      excludeSelf = true).orderBy("qid", "rank").collect().toSeq
    // brute ranks WITHOUT self then takes top-k; replicate by k+1/filter
    val expect = Similarity.bruteForceTopK(
      corpus, "vec_id", "embedding", queriesDf, "qid", "qv", k = 6)
      .filter($"id" =!= $"qid")
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"qid")
          .orderBy($"cosine".desc, $"id")))
      .filter($"rank" <= 5)
      .orderBy("qid", "rank").collect().toSeq
    assert(got === expect)
    assert(got.size === 15)
  }

  test("centroids are trained once and frozen across appends") {
    val dir = newIndexDir()
    val idx = new IvfIndex(spark, dir, nCells = 4)
    idx.append(corpus.filter($"vec_id" < 32), "vec_id", "embedding")
    val frozen = idx.centroids.get
    idx.append(corpus.filter($"vec_id" >= 32), "vec_id", "embedding")
    assert(idx.centroids.get === frozen,
      "second append must not re-train the centroid matrix")
    // and they match what ivfTrain produces on the first batch alone
    assert(frozen === Similarity.ivfTrain(
      corpus.filter($"vec_id" < 32), "vec_id", "embedding", 4))
  }

  test("cell partition pruning: the scan carries literal cell partition filters") {
    val dir = newIndexDir()
    val idx = new IvfIndex(spark, dir, nCells = 8)
    idx.append(corpus, "vec_id", "embedding")
    val plan = idx.topK(queriesDf.limit(1), "qid", "qv", k = 3, nProbe = 2)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.filter(_.contains("/vectors")).toSeq
    assert(scans.nonEmpty, s"expected a vectors scan in plan:\n$plan")
    assert(scans.forall(_.matches(".*PartitionFilters: \\[[^\\]]*cell#.*")),
      s"expected literal cell partition filters:\n${scans.mkString("\n")}")
  }

  test("partial probe: exact precision, bounded recall loss") {
    val dir = newIndexDir()
    val idx = new IvfIndex(spark, dir, nCells = 4)
    idx.append(corpus, "vec_id", "embedding")
    val full = idx.topK(queriesDf, "qid", "qv", k = 5, nProbe = 4,
      excludeSelf = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val partial = idx.topK(queriesDf, "qid", "qv", k = 5, nProbe = 1,
      excludeSelf = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every returned (qid, id, cosine) is a TRUE cosine (precision 1:
    // the probe restricts candidates, never fabricates them)
    val trueCos = full.map(t => (t._1, t._2) -> t._3).toMap
    partial.foreach { case (qid, id, cos) =>
      trueCos.get((qid, id)).foreach(c => assert(c === cos))
    }
    // single-probe recall on this corpus is positive and ≤ 1
    val hit = partial.count(p => full.contains(p))
    assert(hit > 0 && hit <= full.size)
  }

  test("compact folds segments into one with identical neighbors; vacuum honors current+previous retention") {
    val dir = newIndexDir()
    val idx = new IvfIndex(spark, dir, nCells = 4)
    idx.append(corpus.filter($"vec_id" < 24), "vec_id", "embedding")
    idx.append(corpus.filter($"vec_id" >= 24 && $"vec_id" < 48), "vec_id", "embedding")
    val preCompact = idx.segments
    idx.compact()
    assert(idx.segments.size === 1)
    assert(idx.segments.head.startsWith("seg-3-"))
    assert(idx.vacuum() === Nil) // current + previous still covers v2
    idx.append(corpus.filter($"vec_id" >= 48), "vec_id", "embedding")
    assert(idx.vacuum() === preCompact.sorted)
    val got = idx.topK(queriesDf, "qid", "qv", k = 5, nProbe = 4,
      excludeSelf = true).orderBy("qid", "rank").collect().toSeq
    val expect = Similarity.bruteForceTopK(
      corpus, "vec_id", "embedding", queriesDf, "qid", "qv", k = 6)
      .filter($"id" =!= $"qid")
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"qid")
          .orderBy($"cosine".desc, $"id")))
      .filter($"rank" <= 5)
      .orderBy("qid", "rank").collect().toSeq
    assert(got === expect)
  }

  test("retrain after drifted appends: atomic matrix swap, full-probe exact, low-probe recall restored") {
    // Cluster A has sub-structure in dim 2 (two lobes at ±1), so the
    // first-batch 2-means splits on that dimension. Cluster B (the
    // DRIFT — a region the frozen matrix never saw) varies in dim 2
    // too, so under the frozen matrix B lands in BOTH cells and a
    // single-probe query over B misses its cross-cell true neighbors.
    val aVecs = (0L until 16L).map { i =>
      val lobe = if (i % 2 == 0) 1.0 else -1.0
      i -> Seq(10.0, 0.0, lobe + 0.01 * i, 0.0)
    }
    // B: tight in dim 1, spread in dim 2 with both signs
    val bT3 = Seq(-0.40, -0.20, -0.04, -0.02, 0.30, 0.50, 0.70, 0.90)
    val bVecs = bT3.zipWithIndex.map { case (t3, i) =>
      (100L + i) -> Seq(0.0, 10.0, t3, 0.0)
    }
    val a = aVecs.toDF("vec_id", "embedding")
    val b = bVecs.toDF("vec_id", "embedding")
    val dir = newIndexDir()
    val idx = new IvfIndex(spark, dir, nCells = 2)
    idx.append(a, "vec_id", "embedding")   // trains + freezes on A alone
    val frozen = idx.centroids.get
    idx.append(b, "vec_id", "embedding")   // the drifted batch
    val q = Seq((0L, Seq(0.0, 10.0, 0.02, 0.0))).toDF("qid", "qv")
    def brute(k: Int) = Similarity.bruteForceTopK(
      a.unionByName(b), "vec_id", "embedding", q, "qid", "qv", k = k)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    val want = brute(4)
    val preLow = idx.topK(q, "qid", "qv", k = 4, nProbe = 1)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    // drift symptom: the frozen matrix splits B across cells, so the
    // single-probe result misses true neighbors assigned to the other
    // cell (the spec's premise — if this ever returns exact, the
    // fixture no longer demonstrates drift)
    assert(preLow !== want, s"fixture must show drifted recall loss: $preLow")
    idx.retrain()
    // the swap is atomic and complete: ONE re-assigned segment, a new
    // matrix resolved through the manifest, old matrix file untouched
    // as the previous head's fallback
    assert(idx.segments.size === 1)
    assert(idx.centroids.get !== frozen)
    assert(new java.io.File(dir, "_centroids").exists())
    // full probe is exact across the retrain (assignment-invariant)...
    assert(idx.topK(q, "qid", "qv", k = 4, nProbe = 2)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq === want)
    // ...and the retrained matrix restores single-probe recall: the
    // fresh 2-means separates A from B, so B is one cell again
    assert(idx.topK(q, "qid", "qv", k = 4, nProbe = 1)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq === want)
    // appends after the retrain assign against the NEW matrix and
    // carry the centroids line forward through compaction
    idx.append(Seq((200L, Seq(0.0, 10.0, 0.01, 0.0)))
      .toDF("vec_id", "embedding"), "vec_id", "embedding")
    idx.compact()
    assert(idx.segments.size === 1)
    assert(idx.topK(q, "qid", "qv", k = 1, nProbe = 1)
      .collect().map(_.getLong(1)).toSeq === Seq(200L))
    // vacuum retires centroid versions with their manifests (the
    // current+previous window still covers the retrain head here)
    idx.vacuum(): Unit
    assert(idx.centroids.nonEmpty)
  }

  test("drift-triggered retrain: baseline stamped at train time, auto-retrain restores single-probe recall (r14)") {
    // the retrain fixture's drift shape: train on A, append B from a
    // region the frozen matrix never saw
    val aVecs = (0L until 16L).map { i =>
      val lobe = if (i % 2 == 0) 1.0 else -1.0
      i -> Seq(10.0, 0.0, lobe + 0.01 * i, 0.0)
    }
    val bT3 = Seq(-0.40, -0.20, -0.04, -0.02, 0.30, 0.50, 0.70, 0.90)
    val bVecs = bT3.zipWithIndex.map { case (t3, i) =>
      (100L + i) -> Seq(0.0, 10.0, t3, 0.0)
    }
    val a = aVecs.toDF("vec_id", "embedding")
    val b = bVecs.toDF("vec_id", "embedding")
    val idx = new IvfIndex(spark, newIndexDir(), nCells = 2)
    idx.append(a, "vec_id", "embedding") // trains → baseline stamped
    val base = idx.driftBaseline
    assert(base.isDefined && base.get > 0.9,
      s"training corpus must fit its own matrix tightly: $base")
    val d0 = idx.drift().get
    assert(math.abs(d0) < 1e-6, s"drift right after training must be ~0: $d0")
    assert(!idx.retrainIfDrifted(0.05), "no drift → no retrain")
    idx.append(b, "vec_id", "embedding") // the drifted batch
    val d1 = idx.drift().get
    assert(d1 > 0.05, s"drifted appends must move the metric: $d1")
    val q = Seq((0L, Seq(0.0, 10.0, 0.02, 0.0))).toDF("qid", "qv")
    val want = Similarity.bruteForceTopK(
      a.unionByName(b), "vec_id", "embedding", q, "qid", "qv", k = 4)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(idx.topK(q, "qid", "qv", k = 4, nProbe = 1)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq !== want,
      "fixture premise: drifted single-probe recall is broken")
    // the policy call a streaming foreachBatch would make
    assert(idx.retrainIfDrifted(0.05), "drift above threshold must retrain")
    assert(idx.topK(q, "qid", "qv", k = 4, nProbe = 1)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq === want,
      "auto-retrain must restore single-probe recall")
    // fresh baseline stamped by the retrain; metric re-centered
    assert(math.abs(idx.drift().get) < 1e-6)
    assert(!idx.retrainIfDrifted(0.05), "re-centered → no second retrain")
    // compaction carries the baseline forward with the centroids line
    idx.append(Seq((200L, Seq(0.0, 10.0, 0.01, 0.0)))
      .toDF("vec_id", "embedding"), "vec_id", "embedding")
    idx.compact()
    assert(idx.driftBaseline.isDefined)
    assert(idx.drift().isDefined)
  }

  test("losing the manifest CAS raises CommitConflictException, removes ONLY the loser's segment") {
    val dir = newIndexDir()
    val idx = new IvfIndex(spark, dir, nCells = 4)
    idx.append(corpus.filter($"vec_id" < 32), "vec_id", "embedding")
    val first = idx.segments.head
    // the foreign winner's segment exists under its own unique name —
    // the loser's rollback must leave it alone (the pre-unique-naming
    // design deleted the deterministic seg-<v+1> = the winner's data)
    val foreignSeg = new java.io.File(dir, "seg-2-foreignwriter")
    java.nio.file.Files.createDirectories(foreignSeg.toPath)
    // foreign commit lands inside the batch evaluation — after this
    // append read head=v1, before its CAS (the Bm25IndexSpec pattern)
    val foreign = new java.io.File(dir, "_manifest.v2")
    val body = s"$first\nseg-2-foreignwriter\n"
    val trapped = corpus.filter($"vec_id" >= 32).as[(Long, Seq[Double])]
      .mapPartitions { it =>
        CasFiles.putIfAbsent(foreign, body.getBytes("UTF-8")); it
      }.toDF("vec_id", "embedding")
    intercept[CommitConflictException] {
      idx.append(trapped, "vec_id", "embedding")
    }
    val segDirs = Option(new java.io.File(dir).list()).toSeq.flatten
      .filter(_.startsWith("seg-")).toSet
    assert(segDirs === Set(first, "seg-2-foreignwriter"),
      "loser must clean up its own segment and ONLY its own segment")
    assert(idx.segments === Seq(first, "seg-2-foreignwriter"))
  }

  test("delete scans only segments whose id range overlaps; batchTag replays are pre-scan no-ops (r14)") {
    val idx = new IvfIndex(spark, newIndexDir(), nCells = 4)
    idx.append(corpus.filter($"vec_id" < 32), "vec_id", "embedding")
    idx.append(corpus.filter($"vec_id" >= 32), "vec_id", "embedding")
    val Seq(segLow, segHigh) = idx.segments
    // disjoint-id deletes skip the other segment entirely
    assert(idx.deleteScanSegments(Seq(3L, 9L).toDF("vec_id"), "vec_id")
      === Seq(segLow))
    assert(idx.deleteScanSegments(Seq(40L).toDF("vec_id"), "vec_id")
      === Seq(segHigh))
    assert(idx.deleteScanSegments(Seq(999L).toDF("vec_id"), "vec_id") === Nil)
    assert(idx.delete(Seq(999L).toDF("vec_id"), "vec_id") === 0L)
    // the ADVICE r13 race, now guarded: delete(tag) → re-append same
    // id → REPLAY of delete(tag) must be a no-op, not a tombstone of
    // the re-appended live vector
    assert(idx.delete(Seq(40L).toDF("vec_id"), "vec_id",
      batchTag = Some("takedown:1")) === 1L)
    idx.append(corpus.filter($"vec_id" === 40L), "vec_id", "embedding")
    assert(idx.delete(Seq(40L).toDF("vec_id"), "vec_id",
      batchTag = Some("takedown:1")) === 0L)
    val got = idx.topK(queriesDf, "qid", "qv", k = 64, nProbe = 4)
      .filter($"id" === 40L)
    assert(got.count() > 0, "re-appended vector must stay live after replay")
    // the replay guard must survive MAINTENANCE (r14 review finding:
    // compact/retrain used to drop the folded segments' _batch tags,
    // so a compact between a tagged takedown and its replay would
    // re-tombstone a re-appended id)
    idx.compact()
    assert(idx.delete(Seq(40L).toDF("vec_id"), "vec_id",
      batchTag = Some("takedown:1")) === 0L,
      "replay after compact must still be a no-op")
    idx.retrain()
    assert(idx.delete(Seq(40L).toDF("vec_id"), "vec_id",
      batchTag = Some("takedown:1")) === 0L,
      "replay after retrain must still be a no-op")
    assert(idx.topK(queriesDf, "qid", "qv", k = 64, nProbe = 4)
      .filter($"id" === 40L).count() > 0,
      "the re-appended vector must stay live through maintenance + replays")
    // retrain writes a fresh exact range: still prunable afterwards
    val Seq(seg) = idx.segments
    assert(idx.deleteScanSegments(Seq(999L).toDF("vec_id"), "vec_id") === Nil)
    assert(idx.deleteScanSegments(Seq(1L).toDF("vec_id"), "vec_id")
      === Seq(seg))
  }

  test("opt-in id blooms prune range-overlapped segments on scattered takedowns") {
    // interleaved ranges (odd vs even ids) overlap fully — the range
    // sidecar keeps both segments for any in-range takedown, the
    // opt-in bloom skips the one that provably lacks the id
    def seed(bloomCap: Long): IvfIndex = {
      val idx = new IvfIndex(spark, newIndexDir(), nCells = 4,
        idBloomMaxIds = bloomCap)
      idx.append(corpus.filter($"vec_id" % 2 === 1), "vec_id", "embedding")
      idx.append(corpus.filter($"vec_id" % 2 === 0), "vec_id", "embedding")
      idx
    }
    val withBloom = seed(1000000L)
    val Seq(segOdd, segEven) = withBloom.segments
    assert(withBloom.deleteScanSegments(Seq(8L).toDF("vec_id"), "vec_id")
      === Seq(segEven))
    assert(withBloom.deleteScanSegments(Seq(9L).toDF("vec_id"), "vec_id")
      === Seq(segOdd))
    // pruning invisible in results: neighbors equal a rebuilt index
    assert(withBloom.delete(Seq(8L).toDF("vec_id"), "vec_id") === 1L)
    val rebuilt = new IvfIndex(spark, newIndexDir(), nCells = 4)
    rebuilt.append(corpus.filter($"vec_id" =!= 8L), "vec_id", "embedding")
    assert(withBloom.topK(queriesDf, "qid", "qv", k = 5, nProbe = 4)
      .orderBy("qid", "rank").select("qid", "id").collect().toSeq ===
      rebuilt.topK(queriesDf, "qid", "qv", k = 5, nProbe = 4)
        .orderBy("qid", "rank").select("qid", "id").collect().toSeq)
    // default handle: no blooms written, range alone keeps both
    val noBloom = seed(0L)
    assert(noBloom.deleteScanSegments(Seq(8L).toDF("vec_id"), "vec_id")
      === noBloom.segments)
    // an EMPTY append with blooms opted in must still commit (the
    // empty dynamic-partition write leaves a fileless vectors/ dir —
    // the bloom build must not read it)
    val emptyOk = new IvfIndex(spark, newIndexDir(), nCells = 4,
      idBloomMaxIds = 1000000L)
    emptyOk.append(corpus.limit(4), "vec_id", "embedding")
    emptyOk.append(corpus.filter($"vec_id" < 0), "vec_id", "embedding")
    assert(emptyOk.segments.size === 2)
  }

  test("deleting every vector then compacting yields the EMPTY index; appends restart it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-allgone").toString
    val idx = new graft.storage.IvfIndex(spark, dir, nCells = 2)
    val vs = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(1.0, 1.0))).toDF("vec_id", "embedding")
    idx.append(vs, "vec_id", "embedding")
    assert(idx.delete(Seq(1L, 2L, 3L).toDF("vec_id"), "vec_id") === 3L)
    val q = Seq((1L, Seq(1.0, 0.0))).toDF("qid", "qv")
    // fully tombstoned but un-compacted: empty result, no crash
    assert(idx.topK(q, "qid", "qv", k = 2, nProbe = 2).collect().isEmpty)
    idx.compact()
    // empty index (centroids line retained as the assignment basis)
    assert(idx.segments.isEmpty)
    intercept[IllegalArgumentException](idx.topK(q, "qid", "qv", k = 2, nProbe = 2))
    // retrain on the empty index is refused loudly
    intercept[IllegalArgumentException](idx.retrain())
    idx.append(Seq((9L, Seq(0.5, 0.5))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val got = idx.topK(q, "qid", "qv", k = 2, nProbe = 2).collect()
    assert(got.length === 1 && got(0).getLong(1) === 9L)
  }
}
