package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CurationPipeline, Dedup, PipelineContext}
import graft.sources.Tables

/** The round-8 data-selection / retrieval operators: SemDeDup
  * semantic dedup, DSIR importance weights, BM25 ranked retrieval.
  * Each is pinned two ways — a hand-checkable micro case and a
  * property the driver gate's aggregate can't see (per-row semantics,
  * hashed-feature variant, cap behavior). */
class SelectionRetrievalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // --- semanticDedup ------------------------------------------------

  /** 2-d vectors make cosine hand-checkable: two clusters around the
    * axes, one near-duplicate pair per cluster, one outlier. */
  private def tinyVecs = Seq(
    (0L, Array(1.0f, 0.0f)), // centroid 0
    (1L, Array(0.0f, 1.0f)), // centroid 1
    (2L, Array(0.9998f, 0.02f)), // ~dup of 0
    (3L, Array(0.02f, 0.9998f)), // ~dup of 1
    (4L, Array(0.8f, 0.6f)) // its own point, cos(4,0)=0.8
  ).toDF("id", "v")

  test("semanticDedup marks smaller-id neighbors above theta, keeps the min id") {
    val out = PipelineContext.run { implicit ctx =>
      Dedup.semanticDedup(
        tinyVecs, "id", "v",
        tinyVecs.filter(col("id") < 2), "id", "v",
        minCosine = 0.95)
        .orderBy(col("id")).collect()
    }
    assert(out.length === 5)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // cluster membership: 0,2,4 -> cluster 0; 1,3 -> cluster 1
    assert(byId(0L).getLong(1) === 0L && byId(2L).getLong(1) === 0L
      && byId(4L).getLong(1) === 0L)
    assert(byId(1L).getLong(1) === 1L && byId(3L).getLong(1) === 1L)
    // dups: exactly the two planted near-pairs' larger ids
    assert(out.filter(_.getLong(2) == 1L).map(_.getLong(0)).toSet === Set(2L, 3L))
    // the min id of each cluster is never a dup; 4 is below theta
    assert(byId(0L).getLong(2) === 0L && byId(4L).getLong(2) === 0L)
    // max_prior_sim of 2 is cos(0,2) rounded; kept rows carry null
    assert(byId(2L).getDouble(3) > 0.999)
    assert(byId(0L).isNullAt(3) && byId(4L).isNullAt(3))
  }

  test("semanticDedup equals the brute-force intra-cluster rule on real embeddings") {
    val emb = Tables.embeddings(spark, sfDir)
    val cents = emb.filter(col("vec_id") < 4)
    val engine = PipelineContext.run { implicit ctx =>
      Dedup.semanticDedup(emb, "vec_id", "embedding", cents, "vec_id", "embedding",
        minCosine = 0.3).collect()
    }
    // reference: assignment via the same operator, pairs by driver loop
    val assigned = PipelineContext.run { implicit ctx =>
      graft.operators.Similarity
        .assignToCentroids(emb, "vec_id", "embedding", cents, "vec_id", "embedding")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expectDup = vecs.keys.map { id =>
      id -> vecs.keys.exists(o => o < id && assigned(o) == assigned(id)
        && cos(vecs(o), vecs(id)) >= 0.3)
    }.toMap
    engine.foreach { r =>
      assert((r.getLong(2) == 1L) === expectDup(r.getLong(0)),
        s"id ${r.getLong(0)} dup flag mismatch")
    }
    assert(engine.count(_.getLong(2) == 1L) > 0, "theta chose no dups — dead test")
  }

  test("semanticDedup whale-cluster cap excludes the cluster from the pair stage") {
    val out = PipelineContext.run { implicit ctx =>
      Dedup.semanticDedup(
        tinyVecs, "id", "v",
        tinyVecs.filter(col("id") < 2), "id", "v",
        minCosine = 0.95, maxCluster = 2) // cluster 0 has 3 members -> dropped
        .orderBy(col("id")).collect()
    }
    // cluster 0's members all report kept; cluster 1 (size 2) still dedups
    assert(out.filter(_.getLong(2) == 1L).map(_.getLong(0)).toSet === Set(3L))
  }

  // --- importanceWeights --------------------------------------------

  test("importanceWeights favors target-distribution documents") {
    val docs = Tables.documents(spark, sfDir)
    val scored = PipelineContext.run { implicit ctx =>
      CurationPipeline.importanceWeights(docs, "doc_id", "text",
        isTarget = col("lang") === "en")
        .join(docs.select(col("doc_id").as("id"), col("lang")), Seq("id"))
        .select(col("lang"), col("score"), col("n_tokens")).collect()
    }
    val (en, rest) = scored.partition(_.getString(0) == "en")
    val enMean = en.map(_.getDouble(1)).sum / en.length
    val restMean = rest.map(_.getDouble(1)).sum / rest.length
    assert(enMean > restMean,
      s"target mean $enMean must exceed non-target mean $restMean")
    // n_tokens is the real token count (corpus is single-space
    // separated with no empties, so split sizes are the truth)
    val tok = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byId = PipelineContext.run { implicit ctx =>
      CurationPipeline.importanceWeights(docs, "doc_id", "text",
        isTarget = col("lang") === "en").collect()
    }.map(r => r.getLong(0) -> r.getLong(1)).toMap
    byId.foreach { case (id, n) => assert(n === tok(id)) }
  }

  test("hashed-feature importanceWeights is deterministic and still target-favoring") {
    val docs = Tables.documents(spark, sfDir)
    def run() = PipelineContext.run { implicit ctx =>
      CurationPipeline.importanceWeights(docs, "doc_id", "text",
        isTarget = col("lang") === "en", hashBuckets = 16)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1)
    }
    val a = run(); val b = run()
    assert(a.toSeq === b.toSeq, "hashed scoring must be run-stable")
    val langs = docs.select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (en, rest) = a.partition(p => langs(p._1) == "en")
    assert(en.map(_._2).sum / en.length > rest.map(_._2).sum / rest.length)
  }

  // --- lmPerplexity -------------------------------------------------

  test("lmPerplexity matches a hand-computed add-1 bigram score") {
    val docs = Seq(
      (1L, "a b a b", true), // the LM corpus: bc(a,b)=2, bc(b,a)=1
      (2L, "x y x y", false) // all-OOV
    ).toDF("id", "text", "tgt")
    val out = PipelineContext.run { implicit ctx =>
      CurationPipeline.lmPerplexity(docs, "id", "text", col("tgt"))
        .orderBy(col("id")).collect()
    }
    // V=2; doc1: ln(3/4)+ln(2/3)+ln(3/4) over 3 bigrams
    val lp1 = (math.log((2 + 1.0) / (2 + 2)) + math.log((1 + 1.0) / (1 + 2))
      + math.log((2 + 1.0) / (2 + 2))) / 3
    assert(out(0).getLong(1) === 3L)
    assert(math.abs(out(0).getDouble(2) - math.exp(-lp1)) < 1e-12)
    // all-OOV doc sits exactly at the uniform 1/V floor: ppl = V
    assert(math.abs(out(1).getDouble(2) - 2.0) < 1e-9)
  }

  test("lmPerplexity scores target-language documents as more target-like") {
    val docs = Tables.documents(spark, sfDir)
    val scored = PipelineContext.run { implicit ctx =>
      CurationPipeline.lmPerplexity(docs, "doc_id", "text", col("lang") === "en")
        .join(docs.select(col("doc_id").as("id"), col("lang")), Seq("id"))
        .select(col("lang"), col("ppl")).collect()
    }
    val (en, rest) = scored.partition(_.getString(0) == "en")
    val enMean = en.map(_.getDouble(1)).sum / en.length
    val restMean = rest.map(_.getDouble(1)).sum / rest.length
    assert(enMean < restMean,
      s"en mean ppl $enMean must be below non-en mean $restMean")
  }

  // --- trainQualityClassifier ---------------------------------------

  test("one GD iteration matches a driver-side reference") {
    val docs = Tables.documents(spark, sfDir)
    val got = PipelineContext.run { implicit ctx =>
      CurationPipeline.trainQualityClassifier(
        docs, "doc_id", "text", col("lang") === "en", iters = 1).collect()(0)
    }
    // reference: w = round9(-0.5 * mean(x * (0.5 - y))) from w=0
    val feats = docs.select(col("text"), (col("lang") === "en").cast("int")).collect()
      .map { r =>
        val t = r.getString(0)
        val toks = 1 + t.length - t.replace(" ", "").length
        val theCnt = (t.length - t.replace("the", "").length) / 3
        (Array(1.0, toks / 100.0, t.length.toDouble / toks / 10.0, theCnt.toDouble / toks),
          r.getInt(1).toDouble)
      }
    val n = feats.length
    val expect = (0 to 3).map { j =>
      val g = feats.map { case (x, y) => x(j) * (0.5 - y) }.sum / n
      val w = BigDecimal(-0.5 * g).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    (0 to 3).foreach { j =>
      assert(math.abs(got.getDouble(1 + j) - expect(j)) < 2e-6,
        s"w$j ${got.getDouble(1 + j)} vs ${expect(j)}")
    }
  }

  test("the trained classifier separates target from non-target documents") {
    val docs = Tables.documents(spark, sfDir)
    val row = PipelineContext.run { implicit ctx =>
      CurationPipeline.trainQualityClassifier(
        docs, "doc_id", "text", col("lang") === "en").collect()(0)
    }
    val w = (1 to 4).map(row.getDouble).toSeq
    val scored = CurationPipeline.qualityClassifierScore(docs, "doc_id", "text", w)
      .join(docs.select(col("doc_id").as("id"), col("lang")), Seq("id"))
      .select(col("lang"), col("score")).collect()
    val (en, rest) = scored.partition(_.getString(0) == "en")
    val enMean = en.map(_.getDouble(1)).sum / en.length
    val restMean = rest.map(_.getDouble(1)).sum / rest.length
    assert(enMean > restMean,
      s"en mean score $enMean must exceed non-en mean $restMean")
    // and the loss must have improved over the w=0 baseline ln(2)
    assert(row.getDouble(5) < math.log(2.0))
  }

  // --- composed selection pipeline ----------------------------------

  test("selection pipeline buckets partition the corpus with a real kept set") {
    val out = graft.operators.PipelineQueries
      .t52SelectionPipeline(spark, sfDir).collect()
    val byBucket = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Tables.documents(spark, sfDir).count()
    assert(byBucket.values.sum === total, "buckets must partition the corpus")
    assert(byBucket.getOrElse("kept", 0L) > 0L, "empty kept set")
    assert(byBucket.getOrElse("kept", 0L) < total, "nothing filtered")
    // first-failure attribution: the p60 perplexity cut alone drops
    // ~40% of docs, so ppl_fail must be the largest drop bucket
    assert(byBucket.getOrElse("ppl_fail", 0L) >=
      byBucket.getOrElse("clf_fail", 0L))
  }

  // --- tokenBudgetSample --------------------------------------------

  test("tokenBudgetSample: budget cut is exclusive, ordered, and nested") {
    val docs = Tables.documents(spark, sfDir)
    def kept(budget: Long) = CurationPipeline.tokenBudgetSample(
      docs, "doc_id", "text", "source", budget)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val small = kept(400L); val big = kept(800L)
    // nested-subset property: a smaller budget keeps a prefix of the
    // same content-stable order
    val bigSet = big.map(t => (t._1, t._2)).toSet
    small.foreach { case (s, id, _) =>
      assert(bigSet((s, id)), s"doc $id in budget-400 but not budget-800")
    }
    assert(small.length < big.length)
    // per source: every doc's EXCLUSIVE offset is under budget, so
    // kept tokens < budget + the crossing doc's own size
    big.groupBy(_._1).foreach { case (src, rows) =>
      val total = rows.map(_._3).sum
      val maxDoc = rows.map(_._3).max
      assert(total < 800L + maxDoc, s"source $src kept $total tokens")
    }
    // at least one doc kept per source present in the corpus
    assert(big.map(_._1).distinct.length ===
      docs.select(col("source")).distinct().count())
  }

  // --- bm25TopDocs --------------------------------------------------

  test("bm25TopDocs matches a hand-computed score on a tiny corpus") {
    val docs = Seq(
      (1L, "cat dog"), // dl 2
      (2L, "cat cat cat dog"), // dl 4
      (3L, "fish fish") // dl 2
    ).toDF("id", "text")
    val q = Seq((7L, "cat")).toDF("qid", "qtext")
    val out = PipelineContext.run { implicit ctx =>
      CurationPipeline.bm25TopDocs(docs, "id", "text", q, "qid", "qtext", k = 5)
        .orderBy(col("rank")).collect()
    }
    // N=3, df(cat)=2, idf = ln(1 + 1.5/2.5); avgdl = 8/3
    val idf = math.log(1.0 + (3 - 2 + 0.5) / 2.5)
    def s(tf: Long, dl: Long): Double = {
      val raw = idf * (tf * (1.2 + 1.0)) /
        (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / (8.0 / 3.0)))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((7L, 2L), (7L, 1L)))
    assert(out(0).getDouble(2) === s(3, 4) && out(1).getDouble(2) === s(1, 2))
    assert(out.map(_.getInt(3)).toSeq === Seq(1, 2))
  }

  test("bm25TopDocs honors k and ranks rare-term hits above saturated ones") {
    val docs = Tables.documents(spark, sfDir)
    val q = Seq((1L, "dup"), (2L, "the")).toDF("qid", "qtext")
    val out = PipelineContext.run { implicit ctx =>
      CurationPipeline.bm25TopDocs(docs, "doc_id", "text", q, "qid", "qtext", k = 3)
        .collect()
    }
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.length <= 3))
    // 'dup' is rare -> its idf (and top score) dominates 'the''s
    val top = byQ.map { case (qid, rows) => qid -> rows.map(_.getDouble(2)).max }
    assert(top(1L) > top(2L), s"rare-term top ${top(1L)} vs stopword top ${top(2L)}")
  }
}
