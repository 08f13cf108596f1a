package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, PipelineContext, Similarity}
import graft.sources.Tables

/** Scale behavior of the LSH candidate generators — the properties the
  * sf0.01 correctness gates can't see: candidate volume must grow
  * sub-quadratically with the corpus (quadratic growth at 4× data =
  * 16× candidates = a plan that dies at 100 TB), and degenerate whale
  * buckets must be dropped, not materialized. */
class LshScaleSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val emb = Tables.embeddings(spark, sfDir)

  /** k key-shifted copies of the corpus with per-copy text markers that
    * dominate the simhash bit votes, so cross-copy docs are far apart
    * in hamming (the scaled corpus adds DATA, not near-duplicates)
    * while within-copy near-dup structure is preserved. */
  private def docsAt(k: Int): DataFrame =
    (0 until k).map { i =>
      docs.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        concat(lit(s"tag$i " * 30), col("text")).as("text"))
    }.reduce(_ unionByName _)

  /** k copies of the embeddings, each rotated by i positions — rotation
    * preserves within-copy inner products exactly while cross-copy
    * pairs decorrelate (i.i.d. corpus stays i.i.d. at 4× the size). */
  private def embAt(k: Int): DataFrame =
    (0 until k).map { i =>
      val rot = if (i == 0) col("embedding")
        else concat(
          slice(col("embedding"), i + 1, 64 - i),
          slice(col("embedding"), 1, i))
      emb.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
        rot.as("embedding"))
    }.reduce(_ unionByName _)

  test("simhash candidate volume grows sub-quadratically at 4x corpus") {
    def cands(k: Int): Long = PipelineContext.run { implicit ctx =>
      Dedup.simhashCandidates(docsAt(k), "doc_id", "text",
        maxHamming = 6, maxBucket = 2000).count()
    }
    val c1 = cands(1)
    val c4 = cands(4)
    assert(c1 > 0, "vacuous: no candidates at 1x")
    // quadratic would be 16x; chunk-pair keys (~65k values/slot) keep
    // random collisions near-linear at this scale
    assert(c4 < c1 * 12, s"candidates grew $c1 -> $c4 (quadratic-like)")
  }

  test("embedding candidate volume: raising planes with n keeps growth sub-quadratic") {
    // the documented 100 TB knob: p ~ log2(n / target bucket size).
    // 4x the corpus with p 6 -> 8 should grow candidates ~4x, not 16x.
    def cands(k: Int, p: Int): Long = PipelineContext.run { implicit ctx =>
      Dedup.embeddingCandidates(embAt(k), "vec_id", "embedding",
        dim = 64, nPlanes = p, bands = 4, maxBucket = 2000).count()
    }
    val c1 = cands(1, 6)
    val c4 = cands(4, 8)
    assert(c1 > 0, "vacuous: no candidates at 1x")
    assert(c4 < c1 * 8, s"candidates grew $c1 -> $c4 with p scaled (expected ~4x)")
  }

  test("whale buckets are dropped, not materialized (log-and-drop)") {
    // 60 identical docs: every chunk-pair bucket holds all 60 > cap=10
    val same = (1L to 60L).map(i => (i, "the same boilerplate text repeated"))
      .toDF("id", "t")
    val pairs = PipelineContext.run { implicit ctx =>
      Dedup.simhashPairs(same, "id", "t", maxHamming = 6, maxBucket = 10).count()
    }
    assert(pairs === 0, "whale bucket must be dropped by the cap")
    // same corpus under the default cap: all C(60,2) pairs survive
    val uncapped = PipelineContext.run { implicit ctx =>
      Dedup.simhashPairs(same, "id", "t", maxHamming = 6).count()
    }
    assert(uncapped === 60L * 59 / 2)
    // embedding whale: identical vectors all land in one bucket per band
    val sameVec = (1L to 60L).map(i => (i, Array.fill(64)(0.5f))).toDF("id", "v")
    val embPairs = PipelineContext.run { implicit ctx =>
      Dedup.embeddingPairs(sameVec, "id", "v", dim = 64,
        minCosine = 0.9, maxBucket = 10).count()
    }
    assert(embPairs === 0, "embedding whale bucket must be dropped by the cap")
  }

  test("banded lshTopK recall beats the single-table floor") {
    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 6)
      .filter(col("id") =!= col("qid"))
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5, dim = 64, nPlanes = 8, bands = 4,
      excludeSelf = true)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    // single-table nPlanes=8 measured 0.14 on this corpus; 4 bands must
    // clear a higher floor (deterministic: fixed corpus, seeded planes)
    assert(recall >= 0.25, s"banded recall $recall below floor")
    // and top-k never contains a duplicate corpus id per query
    val dupFree = Similarity.lshTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5, dim = 64, nPlanes = 4, bands = 4)
      .groupBy(col("qid"), col("id")).count().filter(col("count") > 1).count()
    assert(dupFree === 0, "cross-band candidate duplicated in top-k")
  }

  test("plan pins: capped shapes (window count for simhash, semi-join cap + no vector shuffle for sizing)") {
    def planOf(df: DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    PipelineContext.run { implicit ctx =>
      val sim = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 6)
      val simPlan = planOf(sim)
      // pairs posexplode from capped sorted arrays — NO bucket self-join
      assert(!simPlan.contains("Join"), s"simhash candidates must be join-free:\n$simPlan")
      assert(simPlan.contains("Window"), s"bucket cap must be a window count:\n$simPlan")
      val embp = Dedup.embeddingPairs(emb, "vec_id", "embedding",
        dim = 64, minCosine = 0.35, nPlanes = 4)
      val embPlan = planOf(embp)
      // the cap is a narrow semi-join, and bucket sizing never shuffles vectors
      assert(embPlan.contains("LeftSemi"), s"no semi-join bucket cap in:\n$embPlan")
      assert(!embPlan.contains("SinglePartition"), s"global shuffle in:\n$embPlan")
      ()
    }
  }
}
