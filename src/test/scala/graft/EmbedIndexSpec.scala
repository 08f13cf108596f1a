package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, PipelineContext}
import graft.storage.EmbedIndex

/** Persisted embedding near-dup index (VERDICT r14 missing #4):
  * admission and the corpus-wide pair query must be result-identical
  * to the inline [[Dedup.embeddingPairs]] engine over the same
  * vectors (identical hyperplane seeds → identical buckets → the
  * equality is deterministic whatever banding recalls), with the full
  * shared index lifecycle — tombstones, replay tags, tiered/full
  * compaction, range+bloom takedown pruning, bucket partition
  * pruning. */
class EmbedIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val Dim = 16
  private val Theta = 0.5
  // uncapped in the differential tests: the index caps on
  // EXISTING-side bucket counts while the inline self-pair engine
  // counts both sides — with no cap binding, both admit identically
  private val NoCap = 1000000

  // deterministic corpus with exact-dup directions (scaled copies
  // bucket identically ALWAYS — sign patterns ignore magnitude),
  // noisy near-dups, and unrelated vectors
  private def mkVecs(ids: Seq[Long], seedOf: Long => Long,
      scaleOf: Long => Double): DataFrame = {
    ids.map { id =>
      val rnd = new scala.util.Random(seedOf(id))
      val base = Seq.fill(Dim)(rnd.nextGaussian())
      (id, base.map(_ * scaleOf(id)))
    }.toDF("vec_id", "embedding")
  }

  // existing: even ids; families by id % 10 so several share a
  // direction family (near/exact dups), rest unrelated
  private def existing: DataFrame = mkVecs(
    (2L to 40L by 2).toSeq, id => 100 + id % 10, id => 1.0 + 0.1 * id)

  // incoming: odd ids drawing from the same seed families (exact-dup
  // directions of existing docs) plus novel seeds
  private def incoming: DataFrame = mkVecs(
    (1L to 19L by 2).toSeq,
    id => if (id < 11) 100 + (id + 1) % 10 else 9000 + id,
    _ => 1.0)

  private def newDir(): String =
    java.nio.file.Files.createTempDirectory("graft-emb").toString

  private def mkIndex(dir: String = newDir(),
      bloom: Long = 0L): EmbedIndex =
    new EmbedIndex(spark, dir, dim = Dim, nPlanes = 4, bands = 4,
      nBuckets = 8, idBloomMaxIds = bloom)

  /** The inline reference: embeddingPairs over incoming ∪ existing,
    * drop every incoming id paired with an existing id. */
  private def inlineAdmit(in: DataFrame, ex: DataFrame): Seq[Row] =
    PipelineContext.materialize { implicit ctx =>
      val pairs = ctx.stage(Dedup.embeddingPairs(
        in.unionByName(ex), "vec_id", "embedding", dim = Dim,
        minCosine = Theta, nPlanes = 4, bands = 4, maxBucket = NoCap))
      val exIds = ex.select(col("vec_id").as("ex_id"))
      val dropped = pairs
        .join(exIds, pairs("id2") === exIds("ex_id")).select(col("id1").as("id"))
        .unionByName(pairs
          .join(exIds, pairs("id1") === exIds("ex_id"))
          .select(col("id2").as("id")))
        .distinct()
      in.join(dropped, in("vec_id") === dropped("id"), "left_anti")
    }.orderBy("vec_id").collect().toSeq

  private def probe(idx: EmbedIndex, in: DataFrame): Seq[Row] =
    PipelineContext.materialize { implicit ctx =>
      idx.dedupAgainst(in, "vec_id", "embedding", minCosine = Theta,
        maxBucket = NoCap)
    }.orderBy("vec_id").collect().toSeq

  private def inlinePairs(corpus: DataFrame): Seq[Row] =
    PipelineContext.materialize { implicit ctx =>
      Dedup.embeddingPairs(corpus, "vec_id", "embedding", dim = Dim,
        minCosine = Theta, nPlanes = 4, bands = 4, maxBucket = NoCap)
    }.orderBy("id1", "id2").collect().toSeq

  private def indexPairs(idx: EmbedIndex): Seq[Row] =
    PipelineContext.materialize { implicit ctx =>
      idx.selfPairs(Theta, maxBucket = NoCap)
    }.orderBy("id1", "id2").collect().toSeq

  test("segmented incremental admission ≡ inline embeddingPairs-based dedup") {
    val idx = mkIndex()
    idx.append(existing.filter($"vec_id" % 4 === 0), "vec_id", "embedding")
    idx.append(existing.filter($"vec_id" % 4 === 2), "vec_id", "embedding")
    val got = probe(idx, incoming)
    assert(got === inlineAdmit(incoming, existing))
    // the fixture is non-vacuous in both directions
    assert(got.size < incoming.count(), "some incoming must drop")
    assert(got.nonEmpty, "some incoming must survive")
  }

  test("selfPairs off stored state ≡ inline embeddingPairs over the corpus") {
    val idx = mkIndex()
    idx.append(existing, "vec_id", "embedding")
    val got = indexPairs(idx)
    assert(got === inlinePairs(existing))
    assert(got.nonEmpty, "the corpus has same-direction pairs")
  }

  test("delete tombstones probe-identically to an index rebuilt without the vectors") {
    val idx = mkIndex()
    idx.append(existing.filter($"vec_id" % 4 === 0), "vec_id", "embedding")
    idx.append(existing.filter($"vec_id" % 4 === 2), "vec_id", "embedding")
    val doomed = existing.filter($"vec_id" % 4 === 2).select($"vec_id")
    assert(idx.delete(doomed, "vec_id") === doomed.count())
    val keptCorpus = existing.filter($"vec_id" % 4 === 0)
    assert(probe(idx, incoming) === inlineAdmit(incoming, keptCorpus))
    assert(indexPairs(idx) === inlinePairs(keptCorpus))
    assert(idx.liveDocIds.collect().map(_.getLong(0)).sorted.toSeq ===
      keptCorpus.collect().map(_.getLong(0)).sorted.toSeq)
    // deleting an absent id contributes zero
    assert(idx.delete(Seq(99999L).toDF("vec_id"), "vec_id") === 0L)
  }

  test("batch tags make replayed appends/deletes no-ops and survive tiered+full compaction") {
    val idx = mkIndex(bloom = 100000L)
    idx.append(existing.filter($"vec_id" <= 20), "vec_id", "embedding",
      batchTag = Some("b0"))
    idx.append(existing.filter($"vec_id" > 20), "vec_id", "embedding",
      batchTag = Some("b1"))
    val before = probe(idx, incoming)
    // replayed append: no-op (no new segment, results unchanged)
    idx.append(existing.filter($"vec_id" <= 20), "vec_id", "embedding",
      batchTag = Some("b0"))
    assert(idx.segments.size === 2)
    assert(idx.delete(Seq(2L).toDF("vec_id"), "vec_id",
      batchTag = Some("td")) === 1L)
    val afterDel = probe(idx, incoming)
    // replayed delete: pre-scan no-op
    assert(idx.delete(Seq(2L).toDF("vec_id"), "vec_id",
      batchTag = Some("td")) === 0L)
    idx.compact()
    assert(idx.segments.size === 1)
    assert(idx.committedBatchTags === Set("b0", "b1", "td"))
    assert(probe(idx, incoming) === afterDel)
  }

  test("tiered compaction never rewrites the giant; results invariant (the shared merge policy)") {
    val idx = mkIndex(bloom = 100000L)
    // giant: a bulk corpus well past a mergeFactor in bytes — one
    // UNIQUE gaussian vector per id (repeated vectors dictionary-
    // encode to a small file and collapse the size tiers)
    val giantVecs = mkVecs((1000L until 3000L).toSeq,
      id => 5000 + id, _ => 1.0)
    idx.append(giantVecs, "vec_id", "embedding")
    val giant = idx.segments.head
    idx.append(existing.filter($"vec_id" <= 20), "vec_id", "embedding")
    idx.append(existing.filter($"vec_id" > 20), "vec_id", "embedding")
    val before = probe(idx, incoming)
    val pairsBefore = indexPairs(idx)
    val plan = idx.tieredPlan(10)
    assert(plan.nonEmpty && !plan.flatten.contains(giant), plan.toString)
    assert(idx.compactTiered(10) === 2)
    assert(idx.segments.contains(giant))
    assert(probe(idx, incoming) === before)
    assert(indexPairs(idx) === pairsBefore)
    // merged output carries range+bloom: absent-id takedowns scan nothing
    assert(idx.deleteScanSegments(
      Seq(777777L).toDF("vec_id"), "vec_id") === Nil)
  }

  test("banded scans carry the literal bucket partition filter (pruning pin)") {
    val idx = mkIndex()
    idx.append(existing, "vec_id", "embedding")
    val one = incoming.filter($"vec_id" === 3L)
    PipelineContext.run { implicit ctx =>
      val buckets = idx.probeBuckets(one, "vec_id", "embedding")
      assert(buckets.nonEmpty && buckets.size <= 4,
        "one vector → ≤ bands buckets")
      val plan = idx.bandedScan(buckets)
        .queryExecution.executedPlan.toString
      val scans = plan.linesIterator.filter(_.contains("/banded")).toSeq
      assert(scans.nonEmpty, s"no banded scan in plan:\n$plan")
      assert(scans.forall(_.contains("PartitionFilters: [")), plan)
      assert(scans.forall(l => buckets.forall(b => l.contains(b.toString))),
        s"expected literal bucket set $buckets in:\n${scans.mkString("\n")}")
      assert(probe(idx, one) === inlineAdmit(one, existing))
    }
  }

  test("dedupMaintenance end state ≡ an index rebuilt from the kept vectors (the shared composed job)") {
    val idx = mkIndex()
    idx.append(existing, "vec_id", "embedding")
    val nDropped = PipelineContext.run { implicit ctx =>
      idx.dedupMaintenance(minCosine = Theta, maxBucket = NoCap,
        batchTag = Some("m1"))
    }
    assert(nDropped > 0L, "the seed families give near-dup clusters")
    val liveIds = idx.liveDocIds.collect().map(_.getLong(0)).sorted.toSeq
    val kept = existing.filter($"vec_id".isin(liveIds: _*))
    val rebuilt = mkIndex()
    rebuilt.append(kept, "vec_id", "embedding")
    assert(rebuilt.liveDocIds.collect().map(_.getLong(0)).sorted.toSeq
      === liveIds)
    assert(probe(idx, incoming) === probe(rebuilt, incoming))
    // post-job fixpoint and replay no-op
    assert(indexPairs(idx).isEmpty)
    assert(PipelineContext.run { implicit ctx =>
      idx.dedupMaintenance(minCosine = Theta, maxBucket = NoCap,
        batchTag = Some("m1"))
    } === 0L)
  }

  test("streaming admission against the persisted index (the s08 shape): batch-invisible end state, replay-safe") {
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft-emb-stream")
    val watch = base.resolve("watch")
    java.nio.file.Files.createDirectories(watch)
    existing.coalesce(1).write.parquet(s"$watch/b0")
    incoming.coalesce(1).write.parquet(s"$watch/b1")
    // the file source orders by (mtime, path): pin batch order
    val now = System.currentTimeMillis()
    Seq("b0" -> (now - 120000), "b1" -> now).foreach { case (sub, t) =>
      val d = new java.io.File(s"$watch/$sub")
      (d +: Option(d.listFiles()).toSeq.flatten).foreach(_.setLastModified(t))
    }
    val idx = mkIndex(s"$base/idx")
    def admitBatch(batch: DataFrame, tag: String): Unit =
      // head-tag check FIRST (the s08 rule): a replayed batch must not
      // re-probe an index that already committed its survivors — it
      // would dedup against itself and admit nothing
      if (!batch.isEmpty && !idx.committedBatchTags.contains(tag))
        PipelineContext.run { implicit ctx =>
          val survivors =
            if (idx.segments.isEmpty) batch
            else idx.dedupAgainst(batch, "vec_id", "embedding",
              minCosine = Theta, maxBucket = NoCap)
          idx.append(survivors, "vec_id", "embedding", batchTag = Some(tag))
        }
    val q = spark.readStream.schema(existing.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(watch.toString)
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitBatch(batch, s"es:$batchId")
      }
      .start()
    q.awaitTermination()
    // maintenance under the end-state check: admissions unchanged
    idx.compactTiered(10)
    idx.compact()
    idx.vacuum(): Unit
    // end state ≡ the batch composition over the same data
    val ref = mkIndex()
    ref.append(existing, "vec_id", "embedding")
    PipelineContext.run { implicit ctx =>
      val surv = ref.dedupAgainst(incoming, "vec_id", "embedding",
        minCosine = Theta, maxBucket = NoCap)
      ref.append(surv, "vec_id", "embedding")
    }
    def live(i: EmbedIndex): Seq[Long] =
      i.liveDocIds.collect().map(_.getLong(0)).sorted.toSeq
    assert(live(idx) === live(ref))
    // an at-least-once replay of the last batch is a no-op
    admitBatch(spark.read.parquet(s"$watch/b1"), "es:1")
    assert(live(idx) === live(ref))
  }

  test("regenerate migrates a grown corpus to a new plane-count generation off stored vectors") {
    val idx = mkIndex()
    idx.append(existing.filter($"vec_id" <= 20), "vec_id", "embedding")
    idx.append(existing.filter($"vec_id" > 20), "vec_id", "embedding")
    assert(idx.delete(Seq(4L).toDF("vec_id"), "vec_id") === 1L)
    val next = idx.regenerate(newDir(), newPlanes = 6,
      batchTag = Some("gen2"))
    // the new generation holds exactly the LIVE corpus (tombstones
    // folded at migration) in one segment
    val keptIds = existing.filter($"vec_id" =!= 4L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(next.liveDocIds.collect().map(_.getLong(0)).sorted.toSeq
      === keptIds)
    assert(next.segments.size === 1)
    // the new generation behaves exactly like an index built fresh at
    // the new plane count over the kept corpus — admission equality
    // against a fresh 6-plane reference (bucket keys differ from the
    // 4-plane generation by design, so the comparison target must be
    // a 6-plane build, not the source index)
    val ref = new EmbedIndex(spark, newDir(), dim = Dim, nPlanes = 6,
      bands = 4, nBuckets = 8)
    ref.append(existing.filter($"vec_id" =!= 4L), "vec_id", "embedding")
    def admit6(i: EmbedIndex): Seq[Row] =
      PipelineContext.materialize { implicit ctx =>
        i.dedupAgainst(incoming, "vec_id", "embedding",
          minCosine = Theta, maxBucket = NoCap)
      }.orderBy("vec_id").collect().toSeq
    assert(admit6(next) === admit6(ref))
    // a replayed regeneration bulk-append is a no-op on the NEW index
    val nextSegs = next.segments
    next.append(existing.limit(3), "vec_id", "embedding",
      batchTag = Some("gen2"))
    assert(next.segments === nextSegs, "the gen2 tag guards the bulk append")
    // the old generation is untouched and still queryable
    assert(idx.liveDocIds.count() === keptIds.size.toLong)
  }

  test("regenerateIfOvergrown: an outgrown fixed-plane corpus trips the occupancy trigger; the new generation restores design occupancy (VERDICT r15 missing #2)") {
    // 120 unique directions against 2^2 = 4 sign-mask keys per band —
    // occupancy ≈ 30, deep in the quadratic regime the generation rule
    // exists for (ScaleCheck: 10.3× wall at 16× rows on fixed planes)
    val idx = new EmbedIndex(spark, newDir(), dim = Dim, nPlanes = 2,
      bands = 4, nBuckets = 8)
    val vecs = mkVecs((0L until 120L).toSeq, id => 7000 + id, _ => 1.0)
    idx.append(vecs, "vec_id", "embedding")
    assert(idx.meanBucketOccupancy.exists(_ > 8.0))
    assert(idx.planesFor(120L) === 11) // ⌈4 + log₂ 120⌉
    val dest = newDir()
    val next = idx.regenerateIfOvergrown(dest, batchTag = Some("gen2"))
      .getOrElse(fail("the outgrown corpus must trip the trigger"))
    // the new generation carries the full live corpus at restored
    // (≈1 row per occupied key) occupancy — the linear-regime shape
    assert(next.liveDocIds.count() === 120L)
    assert(next.meanBucketOccupancy.exists(_ <= 2.0))
    // the trigger on the HEALTHY new generation is a no-op
    assert(next.regenerateIfOvergrown(newDir()).isEmpty)
    // a replayed trigger on the old index re-measures, but the tagged
    // bulk append no-ops — the destination generation doesn't double
    val segsBefore = next.segments
    idx.regenerateIfOvergrown(dest, batchTag = Some("gen2")): Unit
    assert(new EmbedIndex(spark, dest, dim = Dim, nPlanes = 11,
      bands = 4, nBuckets = 8).segments === segsBefore)
    // the regenerated index admits exactly like a fresh build at the
    // recommended plane count (the regenerate-spec contract, here
    // under the trigger's own parameter choice)
    val probeIn = mkVecs((200L to 210L).toSeq,
      id => if (id <= 205) 7000 + (id - 200) else 9900 + id, _ => 1.0)
    val ref = new EmbedIndex(spark, newDir(), dim = Dim, nPlanes = 11,
      bands = 4, nBuckets = 8)
    ref.append(vecs, "vec_id", "embedding")
    def admit(i: EmbedIndex): Seq[Row] =
      PipelineContext.materialize { implicit ctx =>
        i.dedupAgainst(probeIn, "vec_id", "embedding", minCosine = Theta,
          maxBucket = NoCap)
      }.orderBy("vec_id").collect().toSeq
    assert(admit(next) === admit(ref))
    assert(admit(next).size < 11, "the copied directions must drop")
  }

  test("a mismatched-params handle fails loudly instead of probing garbage") {
    val dir = newDir()
    val idx = mkIndex(dir)
    idx.append(existing, "vec_id", "embedding")
    val other = new EmbedIndex(spark, dir, dim = Dim, nPlanes = 6,
      bands = 4, nBuckets = 8)
    val e = intercept[IllegalArgumentException] {
      other.append(incoming, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("params"))
  }
}
