package graft

import org.apache.spark.sql.functions._
import graft.storage.{Bm25Index, EmbedIndex, MinHashIndex}

/** Round-17 review items. VERDICT r16 wrong #2: the BM25/banded delete
  * path pays no repartition exchange for a small tombstone id list
  * (the one-file case is a narrow coalesce), and merge rewrites size
  * their postings/banded output from the summed `_stats` rows field
  * (fourth token) instead of a count() action per maintenance call.
  * ADVICE r16: the AQE-off broadcast hint on the MinHash exact-hash
  * probe is gated on a measured row cap. */
class Round17ReviewSpec extends SparkTestBase {
  import spark.implicits._

  private def newDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def mkVecs(ids: Seq[Long], dim: Int): org.apache.spark.sql.DataFrame =
    ids.map { id =>
      val rnd = new scala.util.Random(1000 + id)
      (id, Seq.fill(dim)(rnd.nextGaussian()))
    }.toDF("vec_id", "embedding")

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new java.io.File(dir))
  }

  private def statsOf(dir: String, seg: String): Array[String] =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, seg, "_stats")), "UTF-8").trim.split(" ")

  test("a typical takedown's id list lands in ONE file (the small-delete layout, both families)") {
    val bdir = newDir("graft-r17-bmdel1")
    val bm = new Bm25Index(spark, bdir, nBuckets = 4)
    bm.append((0L until 20L).map(i => (i, s"alpha$i beta$i gamma"))
      .toDF("doc_id", "text"), "doc_id", "text")
    assert(bm.delete(Seq(3L, 7L).toDF("doc_id"), "doc_id") === 2L)
    val bdel = bm.segments.find(_.startsWith("del-")).get
    assert(parquetFiles(s"$bdir/$bdel/ids").size === 1)

    val edir = newDir("graft-r17-emdel1")
    val em = new EmbedIndex(spark, edir, dim = 8,
      nPlanes = 4, bands = 2, nBuckets = 4)
    em.append(mkVecs(0L until 20L, 8), "vec_id", "embedding")
    assert(em.delete(Seq(3L, 7L).toDF("vec_id"), "vec_id") === 2L)
    val edel = em.segments.find(_.startsWith("del-")).get
    assert(parquetFiles(s"$edir/$edel/ids").size === 1)
    assert(em.liveDocIds.count() === 18L)
  }

  test("BM25 full compact sizes and early-exits from _stats metadata; merged stats carry the rows field") {
    val dir = newDir("graft-r17-bmstats")
    val idx = new Bm25Index(spark, dir, nBuckets = 2)
    def docsOf(ids: Seq[Long]) = ids.map(i => (i, s"w${i}a w${i}b shared"))
      .toDF("doc_id", "text")
    idx.append(docsOf(0L until 10L), "doc_id", "text")
    idx.append(docsOf(10L until 20L), "doc_id", "text")
    // every append stamped the 4-token stats (3 posting rows per doc)
    idx.segments.foreach { s =>
      val st = statsOf(dir, s)
      assert(st.length === 4, s"$s _stats=${st.mkString(" ")}")
      assert(st(3).toLong === 30L)
    }
    idx.delete(Seq(5L).toDF("doc_id"), "doc_id"): Unit
    idx.compact()
    val merged = idx.segments
    assert(merged.size === 1 && !merged.head.startsWith("del-"))
    val st = statsOf(dir, merged.head)
    // n/Σdl fold the tombstone exactly; rows is the exact-or-upper sum
    assert(st(0).toLong === 19L)
    assert(st(3).toLong === 60L)
    // scores over the reclaimed head match a fresh rebuild without doc 5
    val fresh = new Bm25Index(spark, newDir("graft-r17-bmfresh"), nBuckets = 2)
    fresh.append(docsOf((0L until 20L).filterNot(_ == 5L)), "doc_id", "text")
    val q = Seq((1L, "w3a shared"))
    assert(idx.topDocs(q, k = 5).collect().toSeq.map(_.toSeq) ===
      fresh.topDocs(q, k = 5).collect().toSeq.map(_.toSeq))
    // a fully-tombstoned compact commits the EMPTY index without
    // building a segment (the metadata-first early exit)
    idx.delete((0L until 20L).toDF("doc_id"), "doc_id"): Unit
    idx.compact()
    assert(idx.segments.isEmpty)
  }

  test("tier merges size from summed stats rows; a stats-stripped constituent falls back to the counted pass with identical results") {
    spark.conf.set("spark.graft.index.rowsPerFile", "50")
    try {
      val dir = newDir("graft-r17-tier")
      val idx = new EmbedIndex(spark, dir, dim = 8,
        nPlanes = 4, bands = 2, nBuckets = 4)
      idx.append(mkVecs(0L until 40L, 8), "vec_id", "embedding")
      idx.append(mkVecs(40L until 80L, 8), "vec_id", "embedding")
      // strip ONE constituent's rows field — planning and the merge
      // must fall back to counting and still produce the same segment
      val victim = idx.segments.head
      val p = java.nio.file.Paths.get(dir, victim, "_stats")
      val three = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .trim.split(" ").take(3).mkString(" ")
      java.nio.file.Files.write(p, s"$three\n".getBytes("UTF-8"))
      assert(idx.compactTiered(10) === 2)
      val merged = idx.segments.head
      val st = statsOf(dir, merged)
      assert(st.length === 4 && st(3).toLong === 160L) // 80 docs × 2 bands
      assert(idx.liveDocIds.count() === 80L)
    } finally spark.conf.unset("spark.graft.index.rowsPerFile")
  }

  test("AQE-off broadcast hint is dropped when the incoming hash set exceeds the row cap") {
    val dir = newDir("graft-r17-bccap")
    val idx = new MinHashIndex(spark, dir,
      shingle = graft.operators.Dedup.WordGrams(2), numHashes = 16,
      bands = 4, nBuckets = 4)
    idx.append((0L until 20L)
      .map(i => (i, s"some document body number $i with shared words"))
      .toDF("doc_id", "text"), "doc_id", "text")
    val entries = idx.segments.zipWithIndex
    val inH = (0 until 10).map(i => s"hash$i").toDF("exh")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.graft.index.broadcastMaxRows", "5")
      val capped = idx.exactMatchedHashes(inH, entries)
      assert(!capped.queryExecution.optimizedPlan.toString
        .contains("strategy=broadcast"),
        "an over-cap hash set must not carry a forced broadcast hint")
      spark.conf.set("spark.graft.index.broadcastMaxRows", "1000000")
      val small = idx.exactMatchedHashes(inH, entries)
      assert(small.queryExecution.optimizedPlan.toString
        .contains("strategy=broadcast"))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.unset("spark.graft.index.broadcastMaxRows")
    }
  }
}
