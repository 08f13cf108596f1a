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
}
