package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.storage.PqIvfIndex

/** The persisted IVFADC index ([[graft.storage.PqIvfIndex]], VERDICT
  * r16 missing #4): codes-in-cells under the shared manifest
  * lifecycle. The accuracy anchor everywhere: full probe over the
  * persisted path must be ROW-IDENTICAL to the inline flat-ADC scan
  * ([[Similarity.pqTopK]]) with the same codebooks — cells, segments,
  * tombstones and merges are layout, never arithmetic. */
class PqIvfIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val Dim = 16
  private val M = 4
  private val Ksub = 8

  private def newDir(): String =
    java.nio.file.Files.createTempDirectory("graft-pqivf").toString

  private def mkVecs(ids: Seq[Long]): DataFrame =
    ids.map { id =>
      val rnd = new scala.util.Random(7000 + id)
      (id, Seq.fill(Dim)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")

  private val corpus = mkVecs(0L until 60L)
  private val queries = mkVecs(Seq(100L, 101L, 102L))

  // externally-trained fixture codebooks: the first Ksub corpus
  // vectors sliced per subspace (the t48/t76 pattern — deterministic,
  // replayable, and distinct codewords)
  private def fixtureCodebooks: Seq[Seq[Seq[Double]]] = {
    val rows = corpus.filter($"vec_id" < Ksub)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .collect().sortBy(_.getLong(0)).map(_.getSeq[Double](1).toIndexedSeq)
    val sub = Dim / M
    (0 until M).map(m => rows.toSeq.map(v => v.slice(m * sub, m * sub + sub)))
  }

  private def flatTopK(over: DataFrame, cbs: Seq[Seq[Seq[Double]]],
      k: Int): Seq[Row] =
    Similarity.pqTopK(
      Similarity.pqEncode(over, "vec_id", "embedding", cbs), "id", "codes",
      queries, "vec_id", "embedding", cbs, k)
      .orderBy("qid", "rank").collect().toSeq

  private def persistedTopK(idx: PqIvfIndex, k: Int): Seq[Row] =
    idx.topK(queries, "vec_id", "embedding", k, nProbe = 4)
      .orderBy("qid", "rank").collect().toSeq

  test("full probe over a two-append build is row-identical to the flat-ADC scan") {
    val cbs = fixtureCodebooks
    val idx = new PqIvfIndex(spark, newDir(), nCells = 4, m = M, ksub = Ksub)
    idx.append(corpus.filter($"vec_id" % 2 === 0), "vec_id", "embedding",
      trainedCodebooks = Some(cbs))
    idx.append(corpus.filter($"vec_id" % 2 === 1), "vec_id", "embedding")
    assert(persistedTopK(idx, 8) === flatTopK(corpus, cbs, 8))
    // quantizers froze at the first append
    assert(idx.codebooks.get === cbs)
    assert(idx.centroids.get.size === 4)
  }

  test("partial probe keeps exact ADC on what it returns; cell pruning carries a literal partition filter") {
    val cbs = fixtureCodebooks
    val idx = new PqIvfIndex(spark, newDir(), nCells = 4, m = M, ksub = Ksub)
    idx.append(corpus, "vec_id", "embedding", trainedCodebooks = Some(cbs))
    val partial = idx.topK(queries, "vec_id", "embedding", k = 8, nProbe = 1)
      .orderBy("qid", "rank").collect().toSeq
    // every partial-probe row's (qid, id, adc) appears in the COMPLETE
    // ranking with the same distance — recall loss only (unprobed
    // cells withhold candidates), never a wrong ADC value
    val complete = persistedTopK(idx, 60)
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(partial.forall(r =>
      complete.contains((r.getLong(0), r.getLong(1), r.getDouble(2)))))
    assert(partial.nonEmpty && partial.size <= 3 * 8)
    // pruning pin: a 1-probe plan reads only the probed cells
    val plan = idx.topK(queries, "vec_id", "embedding", k = 8, nProbe = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("cell"), plan)
  }

  test("tombstone delete folds by manifest order; zero-hit tagged deletes commit markers; replays are no-ops") {
    val cbs = fixtureCodebooks
    val idx = new PqIvfIndex(spark, newDir(), nCells = 4, m = M, ksub = Ksub)
    idx.append(corpus, "vec_id", "embedding", trainedCodebooks = Some(cbs))
    assert(idx.delete(Seq(2L, 4L, 999L).toDF("vec_id"), "vec_id",
      batchTag = Some("td:1")) === 2L)
    assert(idx.liveDocIds.count() === 58L)
    // results equal the flat scan over the surviving corpus
    assert(persistedTopK(idx, 8) ===
      flatTopK(corpus.filter(!$"vec_id".isin(2L, 4L)), cbs, 8))
    // replay: tag-guarded, zero
    assert(idx.delete(Seq(2L, 4L).toDF("vec_id"), "vec_id",
      batchTag = Some("td:1")) === 0L)
    // zero-hit tagged delete commits a marker carrying the tag
    assert(idx.delete(Seq(999L).toDF("vec_id"), "vec_id",
      batchTag = Some("td:2")) === 0L)
    assert(idx.segments.count(_.startsWith("del-")) === 2)
    assert(idx.delete(Seq(5L).toDF("vec_id"), "vec_id",
      batchTag = Some("td:2")) === 0L, "the marker guards the replay")
    assert(idx.liveDocIds.count() === 58L)
  }

  test("full compact folds tombstones into one segment; tiered merge concatenates; results invariant under both") {
    val cbs = fixtureCodebooks
    val idx = new PqIvfIndex(spark, newDir(), nCells = 4, m = M, ksub = Ksub)
    idx.append(corpus.filter($"vec_id" < 20), "vec_id", "embedding",
      trainedCodebooks = Some(cbs))
    idx.append(corpus.filter($"vec_id" >= 20 && $"vec_id" < 40),
      "vec_id", "embedding")
    idx.append(corpus.filter($"vec_id" >= 40), "vec_id", "embedding",
      batchTag = Some("b3"))
    idx.delete(Seq(7L).toDF("vec_id"), "vec_id"): Unit
    val want = flatTopK(corpus.filter($"vec_id" =!= 7L), cbs, 8)
    assert(idx.compactTiered(10) === 3) // three same-tier segments fold
    assert(persistedTopK(idx, 8) === want)
    idx.compact()
    assert(idx.segments.size === 1)
    assert(idx.segments.forall(!_.startsWith("del-")))
    assert(persistedTopK(idx, 8) === want)
    // tags survived both merges
    assert(idx.committedBatchTags.contains("b3"))
    idx.vacuum(): Unit
    assert(persistedTopK(idx, 8) === want)
  }

  test("retrain refreshes both quantizers from the source corpus and stays flat-ADC-exact at full probe") {
    val cbs = fixtureCodebooks
    val idx = new PqIvfIndex(spark, newDir(), nCells = 4, m = M, ksub = Ksub)
    idx.append(corpus, "vec_id", "embedding", trainedCodebooks = Some(cbs))
    idx.delete(Seq(1L, 3L).toDF("vec_id"), "vec_id"): Unit
    idx.retrain(corpus, "vec_id", "embedding")
    val newCbs = idx.codebooks.get
    assert(newCbs !== cbs, "codebooks refreshed from the live corpus")
    assert(idx.segments.size === 1)
    assert(idx.liveDocIds.count() === 58L)
    // full-probe ADC against the NEW codebooks = flat scan of the
    // live corpus encoded with the same new codebooks
    assert(persistedTopK(idx, 8) ===
      flatTopK(corpus.filter(!$"vec_id".isin(1L, 3L)), newCbs, 8))
  }

  test("an empty batch commits a schema-bearing segment; appends stay replayable by tag") {
    val cbs = fixtureCodebooks
    val idx = new PqIvfIndex(spark, newDir(), nCells = 4, m = M, ksub = Ksub)
    idx.append(corpus.filter($"vec_id" < 30), "vec_id", "embedding",
      trainedCodebooks = Some(cbs), batchTag = Some("b1"))
    idx.append(corpus.filter($"vec_id" < 0), "vec_id", "embedding",
      batchTag = Some("b2")) // empty micro-batch
    val segsBefore = idx.segments
    idx.append(corpus.filter($"vec_id" < 30), "vec_id", "embedding",
      batchTag = Some("b1")) // replay — no-op
    assert(idx.segments === segsBefore)
    assert(idx.liveDocIds.count() === 30L)
    assert(persistedTopK(idx, 8) ===
      flatTopK(corpus.filter($"vec_id" < 30), cbs, 8))
  }
}
