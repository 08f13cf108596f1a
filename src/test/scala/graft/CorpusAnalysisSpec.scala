package graft

import org.apache.spark.sql.functions._
import graft.operators.{CurationPipeline, Dedup, PipelineContext, Similarity}

/** Round-6 corpus-analysis operators: duplicate-n-gram fraction,
  * heavy hitters, exact-percentile profiling, cutpoint curriculum
  * buckets, and embedding cluster assignment. */
class CorpusAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("dupNgramStats: novel doc scores 0, full repeat scores 1, overlap in between") {
    PipelineContext.run { implicit ctx =>
      val docs = Seq(
        (1L, "a b c d"),        // all bigrams first-seen here
        (2L, "a b c d"),        // exact repeat: every bigram dup
        (3L, "c d x y"),        // "c d" seen in doc 1; "d x","x y" novel
        (4L, "p q")             // disjoint vocab
      ).toDF("doc_id", "text")
      val out = CurationPipeline.dupNgramStats(docs, "doc_id", "text", n = 2)
        .orderBy($"id").collect()
      assert(out.map(r => (r.getLong(0), r.getDouble(3))).toSeq ===
        Seq((1L, 0.0), (2L, 1.0), (3L, math.rint(1.0 / 3 * 1e6) / 1e6), (4L, 0.0)))
      // n_grams counts DISTINCT shingles ("a b","b c","c d" for docs 1-2)
      assert(out.map(_.getLong(1)).toSeq === Seq(3L, 3L, 3L, 1L))
    }
  }

  test("dupNgramStats: duplicate direction follows id order, not row order") {
    PipelineContext.run { implicit ctx =>
      // same text under two ids: the SMALLER id is the original in both
      // input orderings (first-owner = min id, not first-encountered)
      val docs = Seq((9L, "u v w"), (2L, "u v w")).toDF("doc_id", "text")
      val out = CurationPipeline.dupNgramStats(docs, "doc_id", "text", n = 2)
        .orderBy($"id").collect()
      assert(out.map(r => (r.getLong(0), r.getDouble(3))).toSeq ===
        Seq((2L, 0.0), (9L, 1.0)))
    }
  }

  test("heavyHitters: frequency order with lexicographic tie-break, k bound") {
    val docs = Seq("b b b a a c", "a c d", "  ").toDF("text")
    val out = CurationPipeline.heavyHitters(docs, "text", k = 3).collect()
    // a:3 b:3 c:2 d:1 — tie at 3 breaks to 'a' first; k=3 cuts 'd'
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("a", 3L), ("b", 3L), ("c", 2L)))
  }

  test("corpusProfile: exact percentiles interpolate, mean/min/max exact") {
    val df = (1 to 5).map(i => ("g", i.toLong)).toDF("grp", "v")
    val r = CurationPipeline.corpusProfile(df, "grp", "v", Seq(0.25, 0.5))
      .collect().head
    assert(r.getAs[Long]("n") === 5L)
    assert(r.getAs[Long]("min_v") === 1L && r.getAs[Long]("max_v") === 5L)
    assert(r.getAs[Double]("avg_v") === 3.0)
    assert(r.getAs[Double]("p25") === 2.0) // 0.25*(5-1) = index 1 exactly
    assert(r.getAs[Double]("p50") === 3.0)
  }

  test("corpusProfile: approx path stays within t-digest tolerance") {
    val df = (1 to 1000).map(i => ("g", i.toLong)).toDF("grp", "v")
    val r = CurationPipeline.corpusProfile(df, "grp", "v", Seq(0.5), exact = false)
      .collect().head
    assert(math.abs(r.getAs[Double]("p50") - 500.0) <= 10.0)
  }

  test("corpusProfile: fractional percentiles get precise names, duplicates rejected") {
    val df = (1 to 9).map(i => ("g", i.toLong)).toDF("grp", "v")
    val cols = CurationPipeline.corpusProfile(df, "grp", "v", Seq(0.125, 0.95)).columns
    assert(cols.contains("p12_5") && cols.contains("p95"))
    // near-collisions now get distinct names instead of both mapping
    // to p25 — only a literal duplicate still fails
    val near = CurationPipeline.corpusProfile(df, "grp", "v", Seq(0.25, 0.254)).columns
    assert(near.contains("p25") && near.contains("p25_4"))
    intercept[IllegalArgumentException] {
      CurationPipeline.corpusProfile(df, "grp", "v", Seq(0.25, 0.25))
    }
  }

  test("curriculumBuckets/shardAssign: output-column collisions fail loudly") {
    val df = Seq((1L, 2L)).toDF("bucket", "score")
    intercept[IllegalArgumentException] {
      CurationPipeline.curriculumBuckets(df, "score", nBuckets = 2)
    }
    val df2 = Seq((1L, 2L)).toDF("shard", "doc_id")
    intercept[IllegalArgumentException] {
      CurationPipeline.shardAssign(df2, "doc_id", nShards = 4)
    }
  }

  test("curriculumBuckets: approx path buckets a uniform corpus within tolerance") {
    val df = (1 to 1000).map(i => (i.toLong, i.toLong)).toDF("id", "score")
    val out = CurationPipeline.curriculumBuckets(df, "score", nBuckets = 4,
      exact = false)
    val ns = out.groupBy($"bucket").count().orderBy($"bucket")
      .collect().map(_.getLong(1))
    assert(ns.length === 4 && ns.sum === 1000L)
    assert(ns.forall(n => n >= 200 && n <= 300)) // t-digest ±error on 250
  }

  test("curriculumBuckets: deciles are balanced, ordered, and exhaustive") {
    val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("id", "score")
    val out = CurationPipeline.curriculumBuckets(df, "score", nBuckets = 10)
    val byBucket = out.groupBy($"bucket").agg(
      count(lit(1)).as("n"), min($"score").as("lo"), max($"score").as("hi"))
      .orderBy($"bucket").collect()
    assert(byBucket.map(_.getInt(0)).toSeq === (0 until 10))
    assert(byBucket.map(_.getLong(1)).sum === 100L)
    // bucket ranges must not interleave: each bucket's min > previous max
    val his = byBucket.map(_.getLong(3)); val los = byBucket.map(_.getLong(2))
    assert(los.drop(1).zip(his.dropRight(1)).forall { case (lo, hi) => lo > hi })
    // uniform scores → ~equal deciles (cutpoint interpolation keeps ±1)
    assert(byBucket.map(_.getLong(1)).forall(n => n >= 9 && n <= 11))
  }

  test("dedupSpans: repeated block survives once, docs reassemble in order") {
    PipelineContext.run { implicit ctx =>
      val docs = Seq(
        (1L, "a b c d"),   // blocks (bt=2): "a b", "c d"
        (2L, "c d e f"),   // "c d" dropped (doc 1 owns it), "e f" kept
        (3L, "a b c d")    // everything dropped
      ).toDF("doc_id", "text")
      val out = CurationPipeline.dedupSpans(docs, "doc_id", "text", blockTokens = 2)
        .orderBy($"id").collect()
      assert(out.map(r => (r.getLong(0), r.getString(3))).toSeq ===
        Seq((1L, "a b c d"), (2L, "e f"), (3L, "")))
      assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
        Seq((2L, 2L), (2L, 1L), (2L, 0L)))
    }
  }

  test("dedupSpans: within-doc repeats collapse to the first position") {
    PipelineContext.run { implicit ctx =>
      val docs = Seq((1L, "x y x y x y")).toDF("doc_id", "text")
      val out = CurationPipeline.dedupSpans(docs, "doc_id", "text", blockTokens = 2)
        .collect().head
      assert(out.getString(3) === "x y")
      assert(out.getLong(1) === 3L && out.getLong(2) === 1L)
    }
  }

  test("dedupAgainst: exact and near dups of the existing corpus drop, novel and within-batch dups survive") {
    PipelineContext.run { implicit ctx =>
      val existing = Seq(
        (0L, "the quick brown fox jumps over the lazy dog today"),
        (2L, "completely different existing content about spark plans")
      ).toDF("doc_id", "text")
      val incoming = Seq(
        (11L, "the quick brown fox jumps over the lazy dog today"), // exact dup
        (13L, "the quick brown fox jumps over the lazy dog tonight"), // near dup
        (15L, "an entirely novel incoming document about minhash bands"),
        (17L, "an entirely novel incoming document about minhash bands") // dup of 15 — NOT collapsed here
      ).toDF("doc_id", "text")
      val kept = Dedup.dedupAgainst(incoming, existing, "doc_id", "text",
        shingle = Dedup.WordGrams(2), minJaccard = 0.5)
        .select($"doc_id").collect().map(_.getLong(0)).sorted
      assert(kept.toSeq === Seq(15L, 17L))
    }
  }

  test("dedupAgainst: short shingle-free docs pass the near stage") {
    PipelineContext.run { implicit ctx =>
      val existing = Seq((0L, "alpha beta gamma delta")).toDF("doc_id", "text")
      val incoming = Seq((1L, "x")).toDF("doc_id", "text") // < 2 words: no bigram
      val kept = Dedup.dedupAgainst(incoming, existing, "doc_id", "text",
        shingle = Dedup.WordGrams(2), minJaccard = 0.5)
      assert(kept.count() === 1L)
    }
  }

  test("dedupSpans invariants on a seeded random corpus: global block uniqueness, ordered subsequence") {
    PipelineContext.run { implicit ctx =>
      val rnd = new scala.util.Random(42)
      val vocab = Vector("aa", "bb", "cc", "dd", "ee")
      val docs = (1L to 60L).map { i =>
        (i, Seq.fill(2 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }.toDF("doc_id", "text")
      val out = CurationPipeline.dedupSpans(docs, "doc_id", "text", blockTokens = 3)
        .collect()
      // kept never exceeds total, and every doc comes back
      assert(out.length === 60)
      assert(out.forall(r => r.getLong(2) <= r.getLong(1)))
      // the kept corpus has no repeated block anywhere (the operator's
      // whole contract), and each doc's clean text is a subsequence of
      // its original tokens in order
      val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val seen = scala.collection.mutable.Set.empty[String]
      out.foreach { r =>
        val blocks = r.getString(3).split(" ").filter(_.nonEmpty).grouped(3)
          .map(_.mkString(" ")).toSeq
        blocks.foreach { b => assert(seen.add(b), s"block '$b' kept twice") }
        val o = orig(r.getLong(0)).split(" ").toSeq
        val c = r.getString(3).split(" ").filter(_.nonEmpty).toSeq
        // subsequence check
        var oi = 0
        c.foreach { tok =>
          oi = o.indexOf(tok, oi)
          assert(oi >= 0, s"token '$tok' out of order for doc ${r.getLong(0)}")
          oi += 1
        }
      }
    }
  }

  // --- dedupSpansAnchored: independent Scala reference simulation ---------

  private def md5Bucket(s: String, mod: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(8), 16) % mod
  }

  /** Reference re-implementation of the content-defined boundary rule
    * (anchor at md5%mod==0, gaps clamped at B strides) — 1-based
    * (pos, block) pairs for one doc's tokens. */
  private def anchoredBlocks(
      tokens: Seq[String], bt: Int, mod: Int): Seq[(Int, String)] = {
    val n = math.max(tokens.size, 1)
    val anchors = (2 to tokens.size).filter(i => md5Bucket(tokens(i - 1), mod) == 0)
    val e = (1 +: anchors) :+ (n + 1)
    val starts = e.sliding(2).flatMap {
      case Seq(s, t) => s until t by bt
      case _ => Seq.empty
    }.toVector
    val sx = starts :+ (n + 1)
    starts.indices.map { k =>
      (sx(k), tokens.slice(sx(k) - 1, sx(k + 1) - 1).mkString(" "))
    }
  }

  test("dedupSpansAnchored: a passage duplicated at an arbitrary offset is caught (fixed stride misses it)") {
    PipelineContext.run { implicit ctx =>
      // 30-token passage; doc 2 repeats it at offset 7 — NOT a multiple
      // of the 4-token stride, so fixed-stride blocks tile it at a
      // different phase and dedupSpans removes nothing
      val passage = (0 until 30).map(i => s"p$i")
      val filler = (0 until 7).map(i => s"f$i")
      val docs = Seq(
        (1L, passage.mkString(" ")),
        (2L, (filler ++ passage).mkString(" "))).toDF("doc_id", "text")
      val fixed = CurationPipeline.dedupSpans(docs, "doc_id", "text", blockTokens = 4)
        .orderBy($"id").collect()
      assert(fixed.forall(r => r.getLong(1) === r.getLong(2)),
        "fixed stride should keep every block (phase-shifted copies)")
      val out = CurationPipeline.dedupSpansAnchored(
        docs, "doc_id", "text", maxBlockTokens = 4, anchorMod = 4)
        .orderBy($"id").collect()
      // doc 1 (first owner) keeps everything
      assert(out(0).getLong(1) === out(0).getLong(2))
      assert(out(0).getString(3) === passage.mkString(" "))
      // doc 2 loses every block from its first in-passage anchor on —
      // the anchored boundaries are content-defined, so the shifted
      // copy's interior blocks are bit-identical to doc 1's
      val anchorsInPassage = (1 to 30).filter(i => md5Bucket(s"p${i - 1}", 4) == 0)
      assert(anchorsInPassage.size >= 2, "fixture needs interior anchors")
      val survivors = out(1).getString(3).split(" ").filter(_.nonEmpty).toSeq
      // survivors = the filler plus at most the passage prefix before
      // the first anchor (clamped blocks straddling it stay distinct)
      val firstAnchor = anchorsInPassage.head
      assert(out(1).getLong(2) < out(1).getLong(1))
      assert(survivors.size <= filler.size + firstAnchor + 3,
        s"shifted passage interior should dedup away, kept: $survivors")
      assert(survivors.count(_.startsWith("p")) < 30 / 2,
        "most passage tokens must be removed from the shifted copy")
    }
  }

  test("dedupSpansAnchored matches the independent reference simulation on a seeded corpus") {
    PipelineContext.run { implicit ctx =>
      val rnd = new scala.util.Random(7)
      val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
      val raw = (1L to 40L).map { i =>
        (i, Seq.fill(rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val docs = raw.toDF("doc_id", "text")
      val bt = 3; val mod = 4
      // reference: blocks per doc -> global first-owner by (id, pos) ->
      // ordered reassembly
      val blocks = raw.flatMap { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty).toSeq match {
          case Nil => Seq("") // tokens('') is [""] after split
          case t => t
        }
        anchoredBlocks(toks, bt, mod).map { case (p, b) => (id, p, b) }
      }
      val owner = blocks.groupBy(_._3).map { case (b, rows) =>
        b -> rows.minBy(r => (r._1, r._2))
      }
      val expected = blocks.groupBy(_._1).map { case (id, rows) =>
        val kept = rows.filter(r => owner(r._3) == r).sortBy(_._2)
        id -> (rows.size.toLong, kept.size.toLong, kept.map(_._3).mkString(" "))
      }
      val got = CurationPipeline.dedupSpansAnchored(
        docs, "doc_id", "text", maxBlockTokens = bt, anchorMod = mod)
        .collect().map(r =>
          r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
      assert(got === expected)
    }
  }

  test("thresholdSweep: monotone survivors, exact fractions, grid order preserved") {
    val df = Seq(0.1, 0.3, 0.5, 0.9).toDF("s")
    val out = CurationPipeline.thresholdSweep(df, "s", Seq(0.0, 0.4, 0.8, 1.0))
      .orderBy($"threshold").collect()
    assert(out.map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2))).toSeq ===
      Seq((0.0, 4L, 1.0), (0.4, 2L, 0.5), (0.8, 1L, 0.25), (1.0, 0L, 0.0)))
  }

  test("composed pipeline gate: stages only ever shrink the corpus, shards partition it") {
    val out = graft.operators.PipelineQueries.t40PipelineE2e(spark, sfDir).collect()
    val total = out.map(_.getLong(1)).sum
    val input = graft.sources.Tables.documents(spark, sfDir).count()
    assert(total > 0 && total <= input,
      s"pipeline emitted $total docs from $input inputs")
    // shards are a partition of the mixed corpus: ids disjoint by
    // construction (md5 bucket), counts positive
    assert(out.forall(_.getLong(1) > 0))
  }

  test("shardAssign is content-stable; writeShards round-trips one dir per shard") {
    val docs = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = CurationPipeline.shardAssign(docs, "doc_id", nShards = 8)
    val b = CurationPipeline.shardAssign(docs.repartition(7), "doc_id", nShards = 8)
    // same row → same shard regardless of input partitioning
    assert(a.select("doc_id", "shard").except(b.select("doc_id", "shard")).count() === 0)
    assert(a.select("shard").distinct().count() === 8)
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    try {
      CurationPipeline.writeShards(docs, "doc_id", nShards = 8, out)
      val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith("shard=")).sorted
      assert(dirs.length === 8)
      val back = spark.read.parquet(out)
      assert(back.count() === 200)
      // the written partition value matches the assignment
      assert(back.join(a.withColumnsRenamed(Map("shard" -> "expect")), "doc_id")
        .filter($"shard" =!= $"expect").count() === 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("vocabCoverage: known OOV fraction and distinct-term accounting") {
    PipelineContext.run { implicit ctx =>
      // a:4 b:3 c:2 d:1 — vocab size 2 = {a, b} covering 7 of 10
      val docs = Seq("a a b c", "a a b b c d").toDF("text")
      val r = CurationPipeline.vocabCoverage(docs, "text", vocabSize = 2)
        .collect().head
      assert(r.getAs[Long]("total_tokens") === 10L)
      assert(r.getAs[Long]("covered_tokens") === 7L)
      assert(r.getAs[Long]("distinct_terms") === 4L)
      assert(r.getAs[Double]("coverage") === 0.7)
    }
  }

  test("assignToCentroids: every vector goes to its true argmax centroid") {
    val vecs = Seq(
      (10L, Array(1.0f, 0.0f)), (11L, Array(0.9f, 0.1f)),
      (12L, Array(0.0f, 1.0f)), (13L, Array(-0.1f, 0.9f))
    ).toDF("id", "vec")
    val cents = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("cid", "cvec")
    val out = Similarity.assignToCentroids(vecs, "id", "vec", cents, "cid", "cvec")
      .orderBy($"id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((10L, 0L), (11L, 0L), (12L, 1L), (13L, 1L)))
    // the winning similarity is the max over both centroids
    assert(out.forall(_.getDouble(2) > 0.7))
  }

  test("assignToCentroids: similarity ties break to the smaller centroid id") {
    val vecs = Seq((1L, Array(1.0f, 1.0f))).toDF("id", "vec")
    val cents = Seq((7L, Array(1.0f, 0.0f)), (3L, Array(0.0f, 1.0f)))
      .toDF("cid", "cvec")
    val out = Similarity.assignToCentroids(vecs, "id", "vec", cents, "cid", "cvec")
      .collect().head
    assert(out.getLong(1) === 3L)
  }
}
