package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Dedup, PipelineContext}

/** The PERSISTED-INDEX half of the randomized differentials — split
  * out of [[PropertySpec]] (r18) so the two heaviest property suites
  * can run in PARALLEL forked test-group JVMs (the full suite must
  * finish inside the driver's verify budget; one 300 s suite caps the
  * group wall). Coverage is unchanged: every test moved verbatim.
  * Deterministic: same fixed-seed sampling as PropertySpec. */
class IndexPropertySpec extends SparkTestBase {
  import spark.implicits._

  /** n deterministic samples of g (plain ScalaCheck, no runner). */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))


  test("persisted BM25 over random batch splits scores exactly like the inline pass") {
    val vocab = Vector("dup", "join", "scan", "hash", "table", "agg",
      "window", "spark", "sort", "merge")
    val corpusGen = for {
      nDocs <- Gen.chooseNum(6, 18)
      docs <- Gen.listOfN(nDocs, Gen.chooseNum(2, 8).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
      cut1 <- Gen.chooseNum(1, nDocs - 1)
      compact <- Gen.oneOf(true, false)
      delMod <- Gen.chooseNum(2, 5) // delete ids ≡ 0 (mod delMod), id > 0
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      cut1, compact, delMod)
    samples(corpusGen, 6).zipWithIndex.foreach {
      case ((docs, cut, doCompact, delMod), i) =>
        val df = docs.toDF("doc_id", "text")
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft-prop-bm25-$i").toString
        val idx = new graft.storage.Bm25Index(spark, dir, nBuckets = 8)
        idx.append(df.filter(col("doc_id") < cut), "doc_id", "text",
          batchTag = Some("b0"))
        idx.append(df.filter(col("doc_id") >= cut), "doc_id", "text",
          batchTag = Some("b1"))
        idx.append(df.filter(col("doc_id") >= cut), "doc_id", "text",
          batchTag = Some("b1")) // replay: must be a no-op
        // tombstone a subset (id > 0 keeps the corpus nonempty); the
        // tagged replay must be a no-op BEFORE it re-scans anything
        val delPred = col("doc_id") > 0 && col("doc_id") % delMod === 0
        val doomed = df.filter(delPred).select(col("doc_id"))
        val nDel = idx.delete(doomed, "doc_id", batchTag = Some("d0"))
        assert(nDel === docs.count { case (id, _) => id > 0 && id % delMod == 0 },
          s"sample $i delete count")
        assert(idx.delete(doomed, "doc_id", batchTag = Some("d0")) === 0L,
          s"sample $i tagged delete replay must no-op")
        if (doCompact) {
          idx.compact() // folds the tombstone physically
          assert(idx.segments.forall(!_.startsWith("del-")),
            s"sample $i compact must fold tombstones")
        }
        val queries = Seq((1L, "dup join"), (2L, "hash scan sort"))
        val got = idx.topDocs(queries, k = 5).orderBy("qid", "rank")
          .collect().toSeq
        // the reference is an index REBUILT without the deleted docs
        val want = PipelineContext.materialize { implicit ctx =>
          graft.operators.CurationPipeline.bm25TopDocs(
            df.filter(!delPred), "doc_id", "text",
            queries.toDF("qid", "qtext"), "qid", "qtext", k = 5)
        }.orderBy("qid", "rank").collect().toSeq
        assert(got === want,
          s"sample $i (cut=$cut compact=$doCompact delMod=$delMod)")
    }
  }

  test("BM25 delete-then-reappend makes the doc live again (manifest-order scope)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bm25-recur").toString
    val idx = new graft.storage.Bm25Index(spark, dir, nBuckets = 8)
    val v1 = Seq((1L, "dup join scan"), (2L, "hash table")).toDF("doc_id", "text")
    idx.append(v1, "doc_id", "text")
    assert(idx.delete(Seq(1L).toDF("doc_id"), "doc_id") === 1L)
    // re-curation: the revised doc 1 re-enters AFTER the tombstone, so
    // the tombstone (scoped to earlier segments) must not suppress it
    idx.append(Seq((1L, "dup merge window")).toDF("doc_id", "text"),
      "doc_id", "text")
    val queries = Seq((1L, "dup"))
    val got = idx.topDocs(queries, k = 5).orderBy("rank").collect().toSeq
    val want = PipelineContext.materialize { implicit ctx =>
      graft.operators.CurationPipeline.bm25TopDocs(
        Seq((1L, "dup merge window"), (2L, "hash table"))
          .toDF("doc_id", "text"),
        "doc_id", "text",
        queries.toDF("qid", "qtext"), "qid", "qtext", k = 5)
    }.orderBy("rank").collect().toSeq
    assert(got === want)
    // and compact folds everything into one tombstone-free segment
    // with identical scores
    idx.compact()
    assert(idx.segments.size === 1 && !idx.segments.head.startsWith("del-"))
    assert(idx.topDocs(queries, k = 5).orderBy("rank").collect().toSeq === want)
  }

  test("BM25 index mutation sequences match the inline engine on the modeled corpus") {
    // the graph-store mutation-model discipline applied to the
    // persisted index: arbitrary interleavings of append / delete /
    // compact / vacuum vs an in-memory corpus model, scores checked
    // against the inline engine over the model after EVERY op
    val vocab = Vector("dup", "join", "scan", "hash", "table", "agg",
      "window", "spark", "sort", "merge")
    sealed trait BOp
    case class BAppend(texts: Seq[String]) extends BOp // ids at apply time
    case class BDelete(ids: Seq[Long]) extends BOp
    case object BCompact extends BOp
    case object BVacuum extends BOp
    val appendGen: Gen[BOp] = for {
      n <- Gen.chooseNum(2, 5)
      texts <- Gen.listOfN(n, Gen.chooseNum(2, 7).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
    } yield BAppend(texts)
    val opGen: Gen[BOp] = Gen.frequency(
      4 -> appendGen,
      3 -> Gen.chooseNum(1, 3).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(1, 25).map(_.toLong))
          .map(ids => BDelete(ids.distinct))),
      2 -> Gen.const(BCompact),
      1 -> Gen.const(BVacuum))
    val opsGen = Gen.chooseNum(5, 8).flatMap(n => Gen.listOfN(n, opGen))
    val queries = Seq((1L, "dup join"), (2L, "hash scan sort"))
    samples(opsGen, 4).zipWithIndex.foreach { case (ops, si) =>
      var nextId = 0L // per-sample id space: deletes target 1..25
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-prop-bm25seq-$si").toString
      val idx = new graft.storage.Bm25Index(spark, dir, nBuckets = 8)
      val model = scala.collection.mutable.LinkedHashMap[Long, String]()
      ops.zipWithIndex.foreach { case (op, oi) =>
        val ctx = s"sample $si op $oi $op"
        op match {
          case BAppend(texts) =>
            val docs = texts.map { t => nextId += 1; (nextId, t) }
            idx.append(docs.toDF("doc_id", "text"), "doc_id", "text")
            docs.foreach { case (id, t) => model(id) = t }
          case BDelete(ids) =>
            val live = ids.filter(model.contains)
            assert(idx.delete(ids.toDF("doc_id"), "doc_id") ===
              live.size.toLong, ctx)
            live.foreach(model.remove)
          case BCompact => if (idx.segments.nonEmpty) idx.compact()
          case BVacuum => idx.vacuum(): Unit
        }
        if (model.nonEmpty) {
          val got = idx.topDocs(queries, k = 5).orderBy("qid", "rank")
            .collect().toSeq
          val want = PipelineContext.materialize { implicit mctx =>
            graft.operators.CurationPipeline.bm25TopDocs(
              model.toSeq.toDF("doc_id", "text"), "doc_id", "text",
              queries.toDF("qid", "qtext"), "qid", "qtext", k = 5)
          }.orderBy("qid", "rank").collect().toSeq
          assert(got === want, ctx)
        }
      }
    }
  }

  test("IVF index mutation sequences match brute force on the modeled corpus") {
    sealed trait VOp
    case class VAppend(vecs: Seq[Seq[Double]]) extends VOp // ids at apply
    case class VDelete(ids: Seq[Long]) extends VOp
    case object VCompact extends VOp
    case object VRetrain extends VOp
    val appendGen: Gen[VOp] = for {
      n <- Gen.chooseNum(3, 6)
      vs <- Gen.listOfN(n, Gen.listOfN(4,
        Gen.chooseNum(-100, 100).map(_ / 25.0)))
    } yield VAppend(vs.map(v =>
      if (v.forall(_ == 0.0)) v.updated(0, 1.0) else v))
    val opGen: Gen[VOp] = Gen.frequency(
      4 -> appendGen,
      3 -> Gen.chooseNum(1, 3).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(1, 25).map(_.toLong))
          .map(ids => VDelete(ids.distinct))),
      1 -> Gen.const(VCompact),
      1 -> Gen.const(VRetrain))
    val opsGen = Gen.chooseNum(4, 7).flatMap(n => Gen.listOfN(n, opGen))
    samples(opsGen, 3).zipWithIndex.foreach { case (ops0, si) =>
      // a fixed seed batch first: centroids train on the first append
      val ops = VAppend(Seq(
        Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0),
        Seq(0.0, 0.0, 1.0, 0.0), Seq(0.5, 0.5, 0.0, 0.0))) +: ops0
      var nextId = 0L
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-prop-ivfseq-$si").toString
      val idx = new graft.storage.IvfIndex(spark, dir, nCells = 3)
      val model = scala.collection.mutable.LinkedHashMap[Long, Seq[Double]]()
      ops.zipWithIndex.foreach { case (op, oi) =>
        val ctx = s"sample $si op $oi $op"
        op match {
          case VAppend(vecs) =>
            val vs = vecs.map { v => nextId += 1; (nextId, v) }
            idx.append(vs.toDF("vec_id", "embedding"), "vec_id", "embedding")
            vs.foreach { case (id, v) => model(id) = v }
          case VDelete(ids) =>
            val live = ids.filter(model.contains)
            assert(idx.delete(ids.toDF("vec_id"), "vec_id") ===
              live.size.toLong, ctx)
            live.foreach(model.remove)
          case VCompact => if (model.nonEmpty) idx.compact()
          case VRetrain => if (model.nonEmpty) idx.retrain()
        }
        if (model.nonEmpty) {
          val corpus = model.toSeq.toDF("vec_id", "embedding")
          val q = corpus.limit(2)
            .select(col("vec_id").as("qid"), col("embedding").as("qv"))
          val got = idx.topK(q, "qid", "qv", k = 3, nProbe = 3,
            excludeSelf = true).orderBy("qid", "rank").collect().toSeq
          val want = graft.operators.Similarity.bruteForceTopK(
            corpus, "vec_id", "embedding", q, "qid", "qv", k = 4)
            .filter(col("id") =!= col("qid"))
            .withColumn("rank", row_number().over(
              org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
                .orderBy(col("cosine").desc, col("id"))))
            .filter(col("rank") <= 3)
            .orderBy("qid", "rank").collect().toSeq
          assert(got === want, ctx)
        }
      }
    }
  }

  test("MinHash index mutation sequences match the inline cross-dedup on the modeled corpus") {
    // the persisted-index mutation-model discipline applied to the
    // near-dup admission index: arbitrary append / delete / compact /
    // vacuum interleavings vs an in-memory corpus model, the probe
    // checked against the inline Dedup.dedupAgainst over the model
    // after EVERY op. The small vocabulary makes real near-dup
    // collisions (and band-bucket whales) common.
    val vocab = Vector("dup", "join", "scan", "hash", "table", "agg",
      "window", "spark")
    sealed trait MOp
    case class MAppend(texts: Seq[String]) extends MOp
    case class MDelete(ids: Seq[Long]) extends MOp
    case object MCompact extends MOp
    case object MVacuum extends MOp
    val appendGen: Gen[MOp] = for {
      n <- Gen.chooseNum(2, 5)
      texts <- Gen.listOfN(n, Gen.chooseNum(3, 8).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
    } yield MAppend(texts)
    case object MCompactTiered extends MOp
    val opGen: Gen[MOp] = Gen.frequency(
      4 -> appendGen,
      3 -> Gen.chooseNum(1, 3).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(1, 25).map(_.toLong))
          .map(ids => MDelete(ids.distinct))),
      2 -> Gen.const(MCompact),
      2 -> Gen.const(MCompactTiered),
      1 -> Gen.const(MVacuum))
    val opsGen = Gen.chooseNum(5, 8).flatMap(n => Gen.listOfN(n, opGen))
    // fixed probe batch in the same vocabulary (ids disjoint from the
    // model's 1..25 space — the cross-dedup id contract)
    val probeBatch = Seq(
      (1001L, "dup join scan hash"),
      (1002L, "window spark agg table window"),
      (1003L, "hash hash table"),
      (1004L, "scan dup join scan table agg"))
    samples(opsGen, 4).zipWithIndex.foreach { case (ops, si) =>
      var nextId = 0L
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-prop-mhseq-$si").toString
      val idx = new graft.storage.MinHashIndex(spark, dir,
        shingle = graft.operators.Dedup.WordGrams(2),
        numHashes = 64, bands = 16, nBuckets = 8)
      val model = scala.collection.mutable.LinkedHashMap[Long, String]()
      ops.zipWithIndex.foreach { case (op, oi) =>
        val ctx = s"sample $si op $oi $op"
        op match {
          case MAppend(texts) =>
            val docs = texts.map { t => nextId += 1; (nextId, t) }
            idx.append(docs.toDF("doc_id", "text"), "doc_id", "text")
            docs.foreach { case (id, t) => model(id) = t }
          case MDelete(ids) =>
            val live = ids.filter(model.contains)
            assert(idx.delete(ids.toDF("doc_id"), "doc_id") ===
              live.size.toLong, ctx)
            live.foreach(model.remove)
          case MCompact => if (idx.segments.nonEmpty) idx.compact()
          case MCompactTiered => idx.compactTiered(10): Unit
          case MVacuum => idx.vacuum(): Unit
        }
        if (model.nonEmpty) {
          val got = PipelineContext.materialize { implicit mctx =>
            idx.dedupAgainst(probeBatch.toDF("doc_id", "text"),
              "doc_id", "text", minJaccard = 0.4)
          }.orderBy("doc_id").collect().toSeq
          val want = PipelineContext.materialize { implicit mctx =>
            graft.operators.Dedup.dedupAgainst(
              probeBatch.toDF("doc_id", "text"),
              model.toSeq.toDF("doc_id", "text"), "doc_id", "text",
              shingle = graft.operators.Dedup.WordGrams(2),
              numHashes = 64, bands = 16, minJaccard = 0.4)
          }.orderBy("doc_id").collect().toSeq
          assert(got === want, ctx)
        }
      }
    }
  }

  test("Embed index mutation sequences match the inline embeddingPairs dedup on the modeled corpus") {
    // the persisted-index mutation-model discipline applied to the
    // embedding admission index (r15): arbitrary append / delete /
    // tiered-compact / full-compact / vacuum interleavings vs an
    // in-memory vector-corpus model, the probe checked against the
    // inline embeddingPairs-based dedup over the model after EVERY
    // op. Vectors draw from a handful of shared DIRECTIONS at varied
    // scales (scaled copies bucket identically and sit at cosine 1 —
    // real collisions) plus unique gaussian noise vectors; identical
    // hyperplane seeds on both engines make the equality
    // deterministic whatever banding recalls.
    val Dim = 8
    def vecOf(fam: Int, scale: Double, jitter: Int): Seq[Double] = {
      val seed = if (fam < 4) 500L + fam else 9000L + jitter
      val rnd = new scala.util.Random(seed)
      Seq.fill(Dim)(rnd.nextGaussian() * scale)
    }
    sealed trait EOp
    case class EAppend(vecs: Seq[Seq[Double]]) extends EOp
    case class EDelete(ids: Seq[Long]) extends EOp
    case object ECompact extends EOp
    case object ECompactTiered extends EOp
    case object EVacuum extends EOp
    val vecGen: Gen[Seq[Double]] = for {
      fam <- Gen.chooseNum(0, 6)
      scale <- Gen.oneOf(0.5, 1.0, 2.0)
      jitter <- Gen.chooseNum(0, 1000)
    } yield vecOf(fam, scale, jitter)
    val opGen: Gen[EOp] = Gen.frequency(
      4 -> Gen.chooseNum(2, 5).flatMap(n =>
        Gen.listOfN(n, vecGen).map(EAppend(_))),
      3 -> Gen.chooseNum(1, 3).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(1, 25).map(_.toLong))
          .map(ids => EDelete(ids.distinct))),
      2 -> Gen.const(ECompact),
      2 -> Gen.const(ECompactTiered),
      1 -> Gen.const(EVacuum))
    val opsGen = Gen.chooseNum(5, 8).flatMap(n => Gen.listOfN(n, opGen))
    // fixed probe batch: two family directions (drop while the family
    // lives), two unique vectors (survive)
    val probeBatch = Seq(
      (1001L, vecOf(0, 1.5, 0)), (1002L, vecOf(1, 0.7, 0)),
      (1003L, vecOf(9, 1.0, 777)), (1004L, vecOf(9, 1.0, 778)))
    val theta = 0.8
    samples(opsGen, 4).zipWithIndex.foreach { case (ops, si) =>
      var nextId = 0L
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-prop-embseq-$si").toString
      val idx = new graft.storage.EmbedIndex(spark, dir, dim = Dim,
        nPlanes = 4, bands = 4, nBuckets = 8)
      val model = scala.collection.mutable.LinkedHashMap[Long, Seq[Double]]()
      ops.zipWithIndex.foreach { case (op, oi) =>
        val ctx = s"sample $si op $oi"
        op match {
          case EAppend(vecs) =>
            val rows = vecs.map { v => nextId += 1; (nextId, v) }
            idx.append(rows.toDF("vec_id", "embedding"),
              "vec_id", "embedding")
            rows.foreach { case (id, v) => model(id) = v }
          case EDelete(ids) =>
            val live = ids.filter(model.contains)
            assert(idx.delete(ids.toDF("vec_id"), "vec_id") ===
              live.size.toLong, ctx)
            live.foreach(model.remove)
          case ECompact => if (idx.segments.nonEmpty) idx.compact()
          case ECompactTiered => idx.compactTiered(10): Unit
          case EVacuum => idx.vacuum(): Unit
        }
        if (model.nonEmpty) {
          val probeDf = probeBatch.toDF("vec_id", "embedding")
          val got = PipelineContext.materialize { implicit mctx =>
            idx.dedupAgainst(probeDf, "vec_id", "embedding",
              minCosine = theta, maxBucket = 1000000)
          }.orderBy("vec_id").collect().map(_.getLong(0)).toSeq
          // inline reference: embeddingPairs over probe ∪ model, drop
          // every probe id paired with a model id
          val want = PipelineContext.materialize { implicit mctx =>
            val union = probeDf.unionByName(
              model.toSeq.toDF("vec_id", "embedding"))
            val pairs = mctx.stage(graft.operators.Dedup.embeddingPairs(
              union, "vec_id", "embedding", dim = Dim,
              minCosine = theta, nPlanes = 4, bands = 4,
              maxBucket = 1000000))
            val exIds = model.keys.toSeq.toDF("ex_id")
            val dropped = pairs
              .join(exIds, pairs("id2") === col("ex_id"))
              .select(col("id1").as("id"))
              .unionByName(pairs.join(exIds, pairs("id1") === col("ex_id"))
                .select(col("id2").as("id")))
              .distinct()
            probeDf.join(dropped, probeDf("vec_id") === dropped("id"),
              "left_anti")
          }.orderBy("vec_id").collect().map(_.getLong(0)).toSeq
          assert(got === want, ctx)
        }
      }
    }
  }

  test("persisted IVF full probe equals brute force across random appends and a retrain") {
    val corpusGen = for {
      n <- Gen.chooseNum(10, 24)
      vecs <- Gen.listOfN(n, Gen.listOfN(4,
        Gen.chooseNum(-100, 100).map(_ / 25.0)))
      cut <- Gen.chooseNum(3, n - 1) // first batch trains: needs >= nCells
      retrain <- Gen.oneOf(true, false)
      delMod <- Gen.chooseNum(3, 6) // delete ids >= 2 with id ≡ 2 (mod delMod)
    } yield (vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) },
      cut, retrain, delMod)
    samples(corpusGen, 5).zipWithIndex.foreach {
      case ((vecs, cut, doRetrain, delMod), i) =>
        // degenerate all-zero vectors break cosine; keep them out
        val clean = vecs.map { case (id, v) =>
          (id, if (v.forall(_ == 0.0)) v.updated(0, 1.0) else v) }
        val df = clean.toDF("vec_id", "embedding")
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft-prop-ivf-$i").toString
        val idx = new graft.storage.IvfIndex(spark, dir, nCells = 3)
        idx.append(df.filter(col("vec_id") < cut), "vec_id", "embedding")
        idx.append(df.filter(col("vec_id") >= cut), "vec_id", "embedding")
        // tombstone a subset (ids >= 2 keep the query vectors live);
        // retrain/compact afterwards must FOLD it, and full-probe
        // equality against brute force over the survivors is the
        // rebuilt-without-those-docs bar
        val delPred = col("vec_id") >= 2 && col("vec_id") % delMod === 2
        val nWant = clean.count { case (id, _) => id >= 2 && id % delMod == 2 }
        assert(idx.delete(df.filter(delPred).select(col("vec_id")),
          "vec_id") === nWant.toLong, s"sample $i delete count")
        // deleting the same ids again finds nothing live
        assert(idx.delete(df.filter(delPred).select(col("vec_id")),
          "vec_id") === 0L, s"sample $i delete replay")
        if (doRetrain) {
          idx.retrain()
          assert(idx.segments.forall(!_.startsWith("del-")),
            s"sample $i retrain must fold tombstones")
        }
        val live = df.filter(!delPred)
        val q = df.filter(col("vec_id") < 2)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        val got = idx.topK(q, "qid", "qv", k = 4, nProbe = 3,
          excludeSelf = true).orderBy("qid", "rank").collect().toSeq
        val want = graft.operators.Similarity.bruteForceTopK(
          live, "vec_id", "embedding", q, "qid", "qv", k = 5)
          .filter(col("id") =!= col("qid"))
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
              .orderBy(col("cosine").desc, col("id"))))
          .filter(col("rank") <= 4)
          .orderBy("qid", "rank").collect().toSeq
        assert(got === want,
          s"sample $i (cut=$cut retrain=$doRetrain delMod=$delMod)")
        // compact folds the tombstone when retrain didn't already
        idx.compact()
        assert(idx.segments.size === 1 &&
          idx.segments.forall(!_.startsWith("del-")), s"sample $i compact")
        assert(idx.topK(q, "qid", "qv", k = 4, nProbe = 3,
          excludeSelf = true).orderBy("qid", "rank").collect().toSeq === want,
          s"sample $i post-compact")
    }
  }
}
