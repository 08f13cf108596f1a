package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.operators.{CurationPipeline, Dedup, Multimodal, PipelineContext, Similarity}
import graft.sources.Tables

/** Training-pipeline operators: invariants the DuckDB gate can't
  * express (LSH recall vs brute force, hamming symmetry, determinism). */
class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val emb = Tables.embeddings(spark, sfDir)

  test("tokens/shingles basics") {
    val row = Seq("a b  c d").toDF("t")
      .select(TF.tokenCount(col("t")).as("n"),
        TF.charShingles(col("t"), 3).as("sh3"),
        TF.wordShingles(col("t"), 2).as("w2"))
      .collect()(0)
    assert(row.getAs[Int]("n") === 4)
    assert(row.getSeq[String](1).contains("a b"))
    assert(row.getSeq[String](2).contains("a b"))
  }

  test("minhash signature approximates jaccard") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy cat tonight"),
      (3L, "completely unrelated text about spark query engines")).toDF("id", "t")
    val pairs = PipelineContext.run { implicit ctx =>
      Dedup.minhashPairs(df, "id", "t", shingle = Dedup.CharGrams(4),
        numHashes = 64, bands = 16, minJaccard = Some(0.3)).collect()
    }
    val ids = pairs.map(r => (r.getLong(1), r.getLong(0))) // (id1,id2) sorted cols
    assert(pairs.exists(r => r.getAs[Long]("id1") === 1L && r.getAs[Long]("id2") === 2L))
    assert(!pairs.exists(r => r.getAs[Long]("id2") === 3L || r.getAs[Long]("id1") === 3L))
  }

  test("simhash: identical texts collide, hamming symmetric bound") {
    val df = Seq((1L, "spark engine for big data"), (2L, "spark engine for big data"),
      (3L, "something else entirely different here")).toDF("id", "t")
    val pairs = PipelineContext.run { implicit ctx =>
      Dedup.simhashPairs(df, "id", "t", maxHamming = 0).collect()
    }
    assert(pairs.length === 1)
    assert(pairs(0).getAs[Long]("hamming") === 0L)
  }

  test("componentsOf: transitive closure, min-id canonical, separate clusters stay apart") {
    // chain 1-2, 2-3 is ONE cluster; 10-11 another; 7-member path
    // exercises multi-round propagation (diameter 6)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L), (24L, 25L), (25L, 26L))
      .toDF("id1", "id2")
    val comp = PipelineContext.run { implicit ctx =>
      Dedup.componentsOf(pairs).as[(Long, Long)].collect().toMap
    }
    assert(comp(1L) === 1L && comp(2L) === 1L && comp(3L) === 1L)
    assert(comp(10L) === 10L && comp(11L) === 10L)
    assert((20L to 26L).forall(comp(_) === 20L))
    assert(comp.size === 12) // only ids that appear in a pair
    // a diameter-6 chain cannot settle in 2 rounds: the DISTRIBUTED
    // loop must fail LOUDLY (forced past the r18 driver-side
    // union-find route, which has no rounds to run out of)
    spark.conf.set("spark.graft.components.maxDriverEdges", "0")
    try {
      val ex = intercept[IllegalArgumentException] {
        PipelineContext.run { implicit ctx =>
          Dedup.componentsOf(pairs, maxIter = 2).collect()
        }
      }
      assert(ex.getMessage.contains("fixpoint"))
    } finally spark.conf.unset("spark.graft.components.maxDriverEdges")
  }

  test("keepRepresentatives: best score per cluster, ties to min id, unclustered pass through") {
    val docs = Seq(
      (1L, "a", 10L), (2L, "b", 30L), (3L, "c", 30L), // cluster {1,2,3}: score tie 2 vs 3 -> keep 2
      (10L, "d", 5L),                                  // unclustered: passes through
      (11L, "e", 1L), (12L, "f", 2L))                  // cluster {11,12}: keep 12 (higher score)
      .toDF("doc_id", "text", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (11L, 12L)).toDF("id1", "id2")
    val kept = PipelineContext.run { implicit ctx =>
      Dedup.keepRepresentatives(docs, "doc_id", pairs, "score")
        .select("doc_id").as[Long].collect().toSet
    }
    assert(kept === Set(2L, 10L, 12L))
    // an id column literally named "id" must not collide with the
    // component frame's internals
    val kept2 = PipelineContext.run { implicit ctx =>
      Dedup.keepRepresentatives(
        docs.withColumnRenamed("doc_id", "id"), "id", pairs, "score")
        .select("id").as[Long].collect().toSet
    }
    assert(kept2 === Set(2L, 10L, 12L))
  }

  test("samplePerStratum: exact-n per stratum, small strata intact, deterministic, window-equivalent") {
    val rows = (1L to 200L).map(i => (i, if (i <= 180) "big" else "small", s"d$i"))
    val df = rows.toDF("id", "stratum", "payload")
    val kept = CurationPipeline.samplePerStratum(df, "id", "stratum", n = 25)
    val byStratum = kept.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(byStratum("big") === 25L)    // capped
    assert(byStratum("small") === 20L)  // fewer than n: all kept
    // deterministic: a rerun (fresh plan) keeps the identical id set
    val ids1 = kept.select("id").as[Long].collect().toSet
    val ids2 = CurationPipeline.samplePerStratum(df.repartition(7), "id", "stratum", n = 25)
      .select("id").as[Long].collect().toSet
    assert(ids1 === ids2)
    // the bounded-agg form selects exactly what the rank window would
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("stratum"))
      .orderBy(md5(col("id").cast("string")), col("id").cast("string"))
    val windowIds = df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= 25).select("id").as[Long].collect().toSet
    assert(ids1 === windowIds)
    // full rows survive (semi join preserves every column)
    assert(kept.columns.toSeq === Seq("id", "stratum", "payload"))
  }

  test("replicateSources: floor+fractional copies, unlisted at 1x, deterministic, rejects w<1") {
    val df = (1L to 400L).map(i => (i, if (i <= 300) "a" else "b")).toDF("id", "src")
    val out = CurationPipeline.replicateSources(df, "id", "src", Map("a" -> 2.5))
    val perId = out.groupBy("id", "src").count().as[(Long, String, Long)].collect()
    // every 'a' row gets 2 or 3 copies; every 'b' row exactly 1
    assert(perId.filter(_._2 == "a").forall(r => r._3 == 2L || r._3 == 3L))
    assert(perId.filter(_._2 == "b").forall(_._3 == 1L))
    // fractional rule: ~half of 'a' (md5-chosen) gets the third copy
    val three = perId.count(r => r._2 == "a" && r._3 == 3L)
    assert(three > 100 && three < 200, s"expected ~150 of 300, got $three")
    // copy_idx is dense 0..copies-1 per row
    val idxs = out.filter(col("id") === 1L).select("copy_idx").as[Int].collect().sorted
    assert(idxs === (0 until idxs.length).toArray)
    // deterministic under repartition: identical (id, copies) multiset
    val again = CurationPipeline.replicateSources(df.repartition(7), "id", "src", Map("a" -> 2.5))
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(perId.map(r => r._1 -> r._3).toMap === again)
    val ex = intercept[IllegalArgumentException] {
      CurationPipeline.replicateSources(df, "id", "src", Map("a" -> 0.5))
    }
    assert(ex.getMessage.contains("replication"))
  }

  test("normalizeText: NFC, Cf removal, separator collapse, trim, lowercase, null") {
    val df = Seq(
      ("a​b",                       // zero-width: removed, no space
        "  x y   z \t"), // NBSP/ctrl/Zl runs -> one space, edges trimmed
      ("Café TIME", "")).toDF("a", "b")
    val out = df.select(
      TF.normalizeText(col("a"), lowercase = true).as("na"),
      TF.normalizeText(col("b")).as("nb")).collect()
    assert(out(0).getString(0) === "ab")
    assert(out(0).getString(1) === "x y z")
    assert(out(1).getString(0) === "café time") // fused + lowered
    assert(out(1).getString(1) === "")
    val nulls = Seq(Option.empty[String]).toDF("a")
      .select(TF.normalizeText(col("a")).as("n")).collect()
    assert(nulls(0).isNullAt(0))
  }

  test("decontaminate: containment arithmetic on known grams") {
    // corpus doc 1 = "a b c d": distinct 2-grams {a b, b c, c d};
    // bench contains "a b" and "b c" but not "c d" -> 2/3.
    // doc 2 shares nothing -> 0. doc 3 is 1 word: its truncated tail
    // shingle "z" appears in bench's tail shingle of "z" -> 1/1.
    val corpus = Seq((1L, "a b c d"), (2L, "x y z q"), (3L, "z"))
      .toDF("doc_id", "text")
    val bench = Seq("a b c", "z").toDF("text")
    val out = PipelineContext.run { implicit ctx =>
      CurationPipeline.decontaminate(corpus, "doc_id", "text",
        bench, "text", n = 2)
        .orderBy(col("id")).collect()
    }
    assert(out.length === 3)
    assert(out(0).getAs[Long]("n_grams") === 3 &&
      out(0).getAs[Long]("n_hits") === 2 &&
      math.abs(out(0).getAs[Double]("containment") - 0.666667) < 1e-6)
    assert(out(1).getAs[Long]("n_hits") === 0 &&
      out(1).getAs[Double]("containment") === 0.0)
    assert(out(2).getAs[Long]("n_grams") === 1 &&
      out(2).getAs[Double]("containment") === 1.0)
  }

  test("decontaminateBloom == decontaminate even when the bloom is saturated with FPs") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val bench = docs.filter(col("doc_id") % 5 === 0)
    def run(f: PipelineContext => org.apache.spark.sql.DataFrame) =
      PipelineContext.run { implicit ctx => f(ctx).orderBy(col("id")).collect().toSeq }
    val exact = run(implicit ctx =>
      CurationPipeline.decontaminate(corpus, "doc_id", "text", bench, "text", n = 3))
    // honest sizing
    val bloom = run(implicit ctx =>
      CurationPipeline.decontaminateBloom(corpus, "doc_id", "text", bench, "text", n = 3))
    assert(bloom === exact)
    // 64-bit bloom for thousands of grams: near-100% FP rate — the
    // exact verify join must still erase every false positive
    val saturated = run(implicit ctx =>
      CurationPipeline.decontaminateBloom(corpus, "doc_id", "text", bench, "text",
        n = 3, expectedItems = 8L, numBits = 64L))
    assert(saturated === exact)
  }

  test("jaccardPairsPrefix == jaccardPairsExact across thresholds (recall 1)") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    def pairs(f: PipelineContext => org.apache.spark.sql.DataFrame) =
      PipelineContext.run { implicit ctx =>
        f(ctx).orderBy(col("id1"), col("id2")).collect().toSeq }
    // the high-threshold design point AND a low threshold where the
    // prefix keeps most grams — the filter must be invisible in both
    for (t <- Seq(0.7, 0.4)) {
      val exact = pairs(implicit ctx =>
        graft.operators.Dedup.jaccardPairsExact(
          docs, "doc_id", "text", graft.operators.Dedup.WordGrams(2), t))
      val prefix = pairs(implicit ctx =>
        graft.operators.Dedup.jaccardPairsPrefix(
          docs, "doc_id", "text", graft.operators.Dedup.WordGrams(2), t))
      assert(prefix === exact, s"divergence at threshold $t")
      assert(exact.nonEmpty, s"vacuous at threshold $t") // corpus has planted near-dups
    }
  }

  test("decontaminateBloom: empty benchmark scores every doc 0 without joining") {
    val docs = graft.sources.Tables.documents(spark, sfDir).limit(10)
    val out = PipelineContext.run { implicit ctx =>
      CurationPipeline.decontaminateBloom(
        docs, "doc_id", "text", docs.filter(lit(false)), "text", n = 3)
        .collect().toSeq
    }
    assert(out.size === 10)
    assert(out.forall(r => r.getAs[Long]("n_hits") === 0L &&
      r.getAs[Double]("containment") === 0.0))
  }

  test("mixSources: deterministic mixture, nested subsets, unlisted sources dropped") {
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "src")
    val half = CurationPipeline.mixSources(df, "id", "src", Map("a" -> 0.5))
      .select("id").as[Long].collect().toSet
    // only listed sources survive; keep rate tracks the weight
    assert(half.forall(_ % 2 == 0))
    assert(half.size > 350 && half.size < 650)
    // determinism: identical set on a second run
    val again = CurationPipeline.mixSources(df, "id", "src", Map("a" -> 0.5))
      .select("id").as[Long].collect().toSet
    assert(again === half)
    // monotone weights give NESTED subsets (mixture sweeps stay comparable)
    val quarter = CurationPipeline.mixSources(df, "id", "src", Map("a" -> 0.25))
      .select("id").as[Long].collect().toSet
    assert(quarter.subsetOf(half))
    assert(CurationPipeline.mixSources(df, "id", "src", Map("a" -> 1.0)).count() === 1000)
    assert(CurationPipeline.mixSources(df, "id", "src", Map("a" -> 0.0)).count() === 0)
    intercept[IllegalArgumentException] {
      CurationPipeline.mixSources(df, "id", "src", Map("a" -> 1.5))
    }
  }

  test("exact dedup keeps one row per content") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "t")
    val kept = Dedup.exactDedup(df, "id", Seq("t")).collect()
    assert(kept.length === 2)
    assert(kept.map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
    val groups = Dedup.exactGroups(df, "id", Seq("t")).collect()
    assert(groups.length === 1 && groups(0).getAs[Long]("n") === 2)
  }

  test("brute-force ANN: self is nearest when included") {
    val top = Similarity.bruteForceTopK(
      emb, "vec_id", "embedding",
      emb.filter(col("vec_id") === 7), "vec_id", "embedding", k = 1)
      .collect()
    assert(top.length === 1)
    assert(top(0).getAs[Long]("id") === 7L)
    assert(math.abs(top(0).getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  test("IVF ANN: full probe equals brute force; partial probe keeps recall") {
    val q = emb.filter(col("vec_id") < 5)
    // full probe (nProbe = nCentroids) must be ROW-IDENTICAL to the
    // exact top-k — this is what lets the t15 gate sit under t04's
    // DuckDB oracle (t04 rounds cosine BEFORE ranking, so rebuild that
    // exact variant here rather than reuse bruteForceTopK's).
    import org.apache.spark.sql.expressions.Window
    val queries = q.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .withColumn("nq", VF.l2Norm(col("qv")))
    val scored = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      .withColumn("nv", VF.l2Norm(col("v")))
      .crossJoin(broadcast(queries))
      .filter(col("id") =!= col("qid"))
      .withColumn("cosine", round(VF.cosinePre(
        VF.dot(col("v"), col("qv")), col("nv"), col("nq")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id"))
    val exact = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("qid", "id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val cents = Similarity.ivfTrain(emb, "vec_id", "embedding", nCentroids = 16)
    val full = Similarity.ivfTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5, nCentroids = 16, nProbe = 16,
      excludeSelf = true, centroids = Some(cents), roundBeforeRank = true)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(full === exact, "full-probe IVF must reproduce exact top-k")
    // partial probe: recall vs exact top-5 (i.i.d. random embeddings
    // are IVF's worst case — neighbors are barely clustered — so the
    // bar is honest but low; self-similar real corpora sit far higher)
    val exactIds = exact.map { case (qid, id, _, _) => (qid, id) }
    val part = Similarity.ivfTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5, nCentroids = 16, nProbe = 8,
      excludeSelf = true, centroids = Some(cents))
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val recall = exactIds.count(part.contains).toDouble / exactIds.size
    assert(recall >= 0.4, s"nProbe=8/16 recall $recall below floor")
    // cost actually shrank: the probed candidate volume (corpus rows in
    // the queries' probed cells) is a real fraction of the full n×q
    // scan brute force pays — the property nProbe < nCentroids buys
    val assigned = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      .withColumn("cell", element_at(VF.nearestCentroids(col("v"), cents, 1), 1))
    val probed = q.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .withColumn("cell", explode(VF.nearestCentroids(col("qv"), cents, 8)))
      .join(assigned, Seq("cell")).count()
    val fullScan = emb.count() * q.count()
    assert(probed < fullScan * 3 / 4,
      s"partial probe scanned $probed of $fullScan candidate pairs")
  }

  test("LSH ANN is a subset-rank of brute force (recall sanity)") {
    val q = emb.filter(col("vec_id") < 5)
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 20)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5, dim = 64, nPlanes = 8)
      .select("qid", "id").as[(Long, Long)].collect()
    // every LSH hit must at least be a true neighbor candidate set member
    assert(lsh.nonEmpty)
    val bfTop1 = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 1)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    // self-match (cos=1) survives LSH: identical vector, identical bucket
    assert(bfTop1.subsetOf(lsh.toSet))
  }

  test("simhash pairs EQUAL brute-force hamming pairs (pigeonhole recall = 1)") {
    // the xxhash64 production path's ground truth: chunk-bucketed
    // candidates + verify must reproduce the full quadratic hamming
    // scan exactly
    val maxH = 6
    val lsh = PipelineContext.run { implicit ctx =>
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = maxH)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
    }
    val exact = PipelineContext.run { implicit ctx =>
      val sigs = ctx.stage(docs.select(col("doc_id").as("id"),
        TF.simhash64(TF.tokens(col("text"))).as("sim")))
      val a = sigs.select(col("id").as("id1"), col("sim").as("s1"))
      val b = sigs.select(col("id").as("id2"), col("sim").as("s2"))
      a.crossJoin(b).filter(col("id1") < col("id2"))
        .filter(TF.hamming64(col("s1"), col("s2")) <= maxH)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
    }
    assert(lsh === exact)
    assert(exact.nonEmpty) // non-vacuous: the corpus has close pairs
  }

  test("md5Hash64 pins the first-16-hex-chars-of-md5 contract (DuckDB parity)") {
    // values independently derived from md5 hex (and reproduced by the
    // t06 oracle's DuckDB half-probe form) — if either engine's hash
    // assembly drifts, this fails before the gate does
    val row = Seq(("abc", "")).toDF("a", "b")
      .select(TF.md5Hash64(col("a")), TF.md5Hash64(col("b"))).collect()(0)
    assert(row.getLong(0) === -8070080442485551184L) // 900150983cd24fb0
    assert(row.getLong(1) === -3162216497309240828L) // d41d8cd98f00b204
  }

  test("portable simhash pairs EQUAL brute-force (the t06 oracle contract)") {
    // t06 runs the md5-portable hash so DuckDB can rebuild signatures;
    // LSH == brute force on that path is what makes the all-pairs
    // DuckDB differential a sound oracle
    val maxH = 6
    val lsh = PipelineContext.run { implicit ctx =>
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = maxH,
        tokenHash = TF.md5Hash64)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
    }
    val exact = PipelineContext.run { implicit ctx =>
      val sigs = ctx.stage(docs.select(col("doc_id").as("id"),
        TF.simhash64(TF.tokens(col("text")), TF.md5Hash64).as("sim")))
      val a = sigs.select(col("id").as("id1"), col("sim").as("s1"))
      val b = sigs.select(col("id").as("id2"), col("sim").as("s2"))
      a.crossJoin(b).filter(col("id1") < col("id2"))
        .filter(TF.hamming64(col("s1"), col("s2")) <= maxH)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
    }
    assert(lsh === exact)
    assert(exact.nonEmpty)
  }

  test("LSH ANN recall vs exact top-k meets threshold") {
    val q = emb.filter(col("vec_id") < 10)
    // top-6 minus the self-match (always rank 1, cosine 1) = exact
    // non-self top-5
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 6)
      .filter(col("id") =!= col("qid"))
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5, dim = 64, nPlanes = 8,
      excludeSelf = true)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    // deterministic given the fixed corpus + seeded planes (measured
    // 0.14 here). i.i.d. random embeddings are the worst case for
    // sign-LSH — top-5 "neighbors" have cosine ≈ 0.3-0.5, right at the
    // bucket boundaries; real embedding corpora cluster, which is what
    // the bucket join exploits. The floor pins that candidates remain
    // correlated with the exact ranking rather than random (random
    // 5-of-499 selection would land ≈ 0.01).
    assert(recall >= 0.1, s"LSH recall $recall below floor")
  }

  test("embedding near-dup pairs: subset of exact pairs, precision 1") {
    val thr = 0.35
    val pairs = PipelineContext.run { implicit ctx =>
      Dedup.embeddingPairs(emb, "vec_id", "embedding",
        dim = 64, minCosine = thr, nPlanes = 4)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
    }
    val exact = {
      val a = emb.select(col("vec_id").as("id1"), col("embedding").as("v1"))
      val b = emb.select(col("vec_id").as("id2"), col("embedding").as("v2"))
      a.crossJoin(b).filter(col("id1") < col("id2"))
        .filter(VF.cosine(col("v1"), col("v2")) >= thr)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
    }
    assert(pairs.nonEmpty)
    assert(pairs.subsetOf(exact), "bucket-join emitted a below-threshold pair")
  }

  test("portable fingerprint: order-sensitive, deterministic, md5-shaped") {
    val fp = Seq("a b c", "c b a", "a b c").toDF("t")
      .select(TF.fingerprintPortable(col("t")).as("f")).collect().map(_.getString(0))
    assert(fp(0) === fp(2))
    assert(fp(0) !== fp(1))
    assert(fp.forall(_.matches("[0-9a-f]{32}")))
  }

  test("langId deterministic and in range") {
    val a = docs.select(TF.langId(col("text")).as("l")).collect().map(_.getString(0))
    val b = docs.select(TF.langId(col("text")).as("l")).collect().map(_.getString(0))
    assert(a.toSeq === b.toSeq)
    assert(a.forall(Set("en", "fr", "es", "de", "zh", "und").contains))
  }

  test("quality score bounded [0,1]") {
    val s = docs.select(TF.qualityScore(col("text")).as("q"))
      .agg(min(col("q")), max(col("q"))).collect()(0)
    assert(s.getDouble(0) >= 0.0 && s.getDouble(1) <= 1.0)
  }

  test("fingerprint: order-sensitive, deterministic") {
    val fp = Seq("a b c", "c b a", "a b c").toDF("t")
      .select(TF.fingerprint(col("t")).as("f")).collect().map(_.getLong(0))
    assert(fp(0) === fp(2))
    assert(fp(0) !== fp(1))
  }

  test("vector functions agree with manual math") {
    val r = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 1.0f, 2.0f))).toDF("a", "b")
      .select(VF.dot(col("a"), col("b")).as("d"),
        VF.l2Norm(col("a")).as("n"),
        VF.cosine(col("a"), col("b")).as("c"),
        VF.l2Distance(col("a"), col("b")).as("e"))
      .collect()(0)
    assert(r.getAs[Double]("d") === 8.0)
    assert(r.getAs[Double]("n") === 3.0)
    assert(math.abs(r.getAs[Double]("c") - 8.0 / 9.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("e") - math.sqrt(2.0)) < 1e-12)
  }

  test("multimodal: frame sample explodes videos only; features typed") {
    val media = Multimodal.syntheticMedia(spark, 30)
    assert(media.schema("bytes").dataType ===
      org.apache.spark.sql.types.BinaryType)
    val frames = Multimodal.frameSample(media, everyMs = 10000)
    assert(frames.count() > media.filter(col("media_type") === "video").count())
    val feats = Multimodal.extractFeatures(media, dim = 16, partitions = 4)
    val f0 = feats.collect()(0).getSeq[Double](2)
    assert(f0.length === 16)
    assert(f0.forall(v => v >= -1.0 && v <= 1.0))
    assert(feats.rdd.getNumPartitions === 4)
  }

  test("multimodal: JDK codecs decode real PNG and WAV payloads") {
    // a real 4×4 PNG: left half black, right half white
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0x000000 else 0xffffff)
    val png = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", png)
    // a real PCM WAV: silence then a full-scale square wave
    val samples = new Array[Byte](2 * 800)
    for (i <- 400 until 800) {
      val v: Short = if (i % 2 == 0) 32000 else -32000
      samples(2 * i) = (v & 0xff).toByte
      samples(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val wav = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(samples), fmt, 800),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wav)

    val rows = Seq(
      (1L, "image", png.toByteArray),
      (2L, "audio", wav.toByteArray),
      (3L, "image", Array[Byte](1, 2, 3)), // undecodable
      (4L, "video", png.toByteArray)) // no JVM codec path
    val df = spark.createDataFrame(rows).toDF("media_id", "media_type", "bytes")
    val out = Multimodal.decodeFeaturesJvm(df, side = 2, audioBins = 2)
      .collect().map(r => r.getLong(0) ->
        Option(r.getSeq[Float](2)).map(_.toArray)).toMap
    // image: 2×2 thumbnail, left column dark, right column bright
    val imgF = out(1L).get
    assert(imgF.length === 4)
    assert(imgF(0) < 0.3 && imgF(1) > 0.7 && imgF(2) < 0.3 && imgF(3) > 0.7)
    // audio: first half silent, second half loud
    val audF = out(2L).get
    assert(audF.length === 2)
    assert(audF(0) < 0.05 && audF(1) > 0.5)
    assert(out(3L).isEmpty && out(4L).isEmpty)
  }

  test("hashSplit: deterministic, partition-independent, leakage-safe") {
    import graft.operators.CurationPipeline
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val a = CurationPipeline.hashSplit(docs, "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // same assignment regardless of physical partitioning
    val b = CurationPipeline.hashSplit(docs.repartition(7), "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
    val frac = a.values.count(_ == "train").toDouble / a.size
    assert(frac > 0.6 && frac < 0.95, s"train fraction $frac far from 80%")
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    // percentages validated
    assertThrows[IllegalArgumentException] {
      CurationPipeline.hashSplit(docs, "doc_id", trainPct = 95, valPct = 10)
    }
  }

  test("packSequences: bins respect the budget given per-doc tokens fit") {
    import graft.operators.CurationPipeline
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val budget = 2048
    val bins = CurationPipeline.packSequences(docs, "doc_id", "text", budget, groups = 8)
      .collect()
    assert(bins.nonEmpty)
    // total tokens across bins == total tokens across docs (no loss)
    val total = docs.select(
      sum(lit(1) + length(col("text")) -
        length(regexp_replace(col("text"), " ", ""))))
      .collect()(0).getLong(0)
    assert(bins.map(_.getAs[Long]("bin_tokens")).sum === total)
    // a bin exceeds the budget only by (at most) its straddling doc:
    // every bin except each group's LAST must carry >= budget-worth of
    // offset span; all docs of one group land in contiguous bins
    val perGroup = bins.groupBy(_.getAs[Long]("group"))
    perGroup.foreach { case (_, rows) =>
      val byBin = rows.sortBy(_.getAs[Long]("bin"))
      val binIds = byBin.map(_.getAs[Long]("bin"))
      assert(binIds.distinct.length === binIds.length)
      // non-final bins: cumulative offsets force bin_tokens + next bin
      // start alignment => each non-final bin holds < budget + max doc
      byBin.init.foreach { r =>
        assert(r.getAs[Long]("bin_tokens") > 0)
      }
    }
    // determinism across partitioning
    val again = CurationPipeline.packSequences(
      docs.repartition(5), "doc_id", "text", budget, groups = 8)
      .collect().map(r => (r.getAs[Long]("group"), r.getAs[Long]("bin"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("bin_tokens"))).toSet
    assert(again === bins.map(r => (r.getAs[Long]("group"), r.getAs[Long]("bin"),
      r.getAs[Long]("n_docs"), r.getAs[Long]("bin_tokens"))).toSet)
  }
}
