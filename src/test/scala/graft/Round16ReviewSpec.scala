package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, PipelineContext}
import graft.storage.{Bm25Index, EmbedIndex, MinHashIndex}

/** Round-16 review items. VERDICT r15 wrong #2: tombstone id-list
  * writes must size by the measured live-hit volume (a GDPR-class
  * purge must not serialize through one task). Missing #3: tier-merge
  * planning must read write-time byte figures from `_stats` instead of
  * recursively walking every segment per maintenance call (the S3
  * metadata storm), falling back to the walk for pre-upgrade segments.
  * ADVICE r15: the MinHash exact-hash probe keeps its broadcast plan
  * when AQE is disabled; BM25's tier merge sizes the postings write
  * from postings ROWS, not summed doc lengths. */
class Round16ReviewSpec extends SparkTestBase {
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

  test("a large takedown's tombstone id list writes >1 file (banded-index delete path)") {
    spark.conf.set("spark.graft.index.delRowsPerFile", "10")
    try {
      val dir = newDir("graft-r16-del")
      val idx = new EmbedIndex(spark, dir, dim = 8,
        nPlanes = 4, bands = 2, nBuckets = 4)
      idx.append(mkVecs(0L until 30L, 8), "vec_id", "embedding")
      val doomed = (0L until 25L).toDF("vec_id")
      assert(idx.delete(doomed, "vec_id") === 25L)
      val delSeg = idx.segments.find(_.startsWith("del-")).get
      // ceil(25 / 10) = 3 round-robin partitions, each non-empty
      val delFiles = parquetFiles(s"$dir/$delSeg/ids")
      assert(delFiles.size === 3, delFiles.map(_.getName).toString)
      assert(idx.liveDocIds.count() === 5L)
    } finally spark.conf.unset("spark.graft.index.delRowsPerFile")
  }

  test("a large takedown's tombstone id list writes >1 file (BM25 delete path)") {
    spark.conf.set("spark.graft.index.delRowsPerFile", "10")
    try {
      val dir = newDir("graft-r16-bmdel")
      val idx = new Bm25Index(spark, dir, nBuckets = 4)
      val docs = (0L until 25L).map(i => (i, s"alpha$i beta$i gamma"))
        .toDF("doc_id", "text")
      idx.append(docs, "doc_id", "text")
      assert(idx.delete((0L until 25L).toDF("doc_id"), "doc_id") === 25L)
      val delSeg = idx.segments.find(_.startsWith("del-")).get
      val delFiles = parquetFiles(s"$dir/$delSeg/ids")
      assert(delFiles.size === 3, delFiles.map(_.getName).toString)
    } finally spark.conf.unset("spark.graft.index.delRowsPerFile")
  }

  test("tier-merge planning reads write-time _stats bytes; pre-upgrade segments fall back to the walk with the same plan") {
    val dir = newDir("graft-r16-stats")
    val idx = new EmbedIndex(spark, dir, dim = 8,
      nPlanes = 4, bands = 2, nBuckets = 4)
    // giant first (its tier isolates it), then three same-tier smalls
    idx.append(mkVecs(1000L until 1800L, 8), "vec_id", "embedding")
    idx.append(mkVecs(0L until 40L, 8), "vec_id", "embedding")
    idx.append(mkVecs(40L until 80L, 8), "vec_id", "embedding")
    idx.append(mkVecs(80L until 120L, 8), "vec_id", "embedding")
    // every writer stamped the third (bytes) field
    val segs = idx.segments
    segs.foreach { s =>
      val stats = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, s, "_stats")), "UTF-8").trim.split(" ")
      assert(stats.length === 4, s"$s _stats=${stats.mkString(" ")}")
      assert(stats(2).toLong > 0L)
      assert(stats(3).toLong > 0L) // banded rows — the r17 merge-sizing field
    }
    val planFromStats = idx.tieredPlan(10)
    assert(planFromStats.nonEmpty)
    assert(!planFromStats.flatten.contains(segs.head), "giant never merges")
    // simulate pre-upgrade segments: strip the bytes field everywhere —
    // planning must fall back to the directory walk and produce the
    // SAME merge plan (the walk measures the same data files plus tiny
    // sidecars, invisible at log-tier granularity)
    segs.foreach { s =>
      val p = java.nio.file.Paths.get(dir, s, "_stats")
      val two = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .trim.split(" ").take(2).mkString(" ")
      java.nio.file.Files.write(p, s"$two\n".getBytes("UTF-8"))
    }
    assert(idx.tieredPlan(10) === planFromStats)
    // and the fallback plan still executes correctly
    assert(idx.compactTiered(10) === 3)
    assert(idx.liveDocIds.count() === 920L)
  }

  test("exact-hash probe keeps a broadcast plan when AQE is disabled, none is forced when AQE is on") {
    val dir = newDir("graft-r16-bc")
    val idx = new MinHashIndex(spark, dir,
      shingle = Dedup.WordGrams(2), numHashes = 16, bands = 4, nBuckets = 4)
    val docs = (0L until 20L)
      .map(i => (i, s"some document body number $i with shared words"))
      .toDF("doc_id", "text")
    idx.append(docs, "doc_id", "text")
    val entries = idx.segments.zipWithIndex
    val inH = Seq("00aabbcc").toDF("exh")
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val off = idx.exactMatchedHashes(inH, entries)
      assert(off.queryExecution.optimizedPlan.toString
        .contains("strategy=broadcast"),
        off.queryExecution.optimizedPlan.toString)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      val on = idx.exactMatchedHashes(inH, entries)
      assert(!on.queryExecution.optimizedPlan.toString
        .contains("strategy=broadcast"),
        "no forced hint under AQE — runtime size picks the strategy")
      // behavior parity: admissions identical under both settings
      val incoming = (20L until 30L)
        .map(i => (i, if (i < 25) s"some document body number ${i - 20} with shared words"
                      else s"fresh unseen content $i"))
        .toDF("doc_id", "text")
      def admit(): Seq[Long] = PipelineContext.materialize { implicit ctx =>
        idx.dedupAgainst(incoming, "doc_id", "text", minJaccard = 0.5)
      }.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val offRes = admit()
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      assert(admit() === offRes)
      assert(offRes === (25L until 30L).toSeq, offRes.toString)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("BM25 tier merge sizes the postings write from postings rows, not summed doc lengths") {
    spark.conf.set("spark.graft.index.rowsPerFile", "25")
    try {
      val dir = newDir("graft-r16-bmtier")
      val idx = new Bm25Index(spark, dir, nBuckets = 2)
      def docsOf(ids: Seq[Long]) = ids.map { i =>
        // 2 distinct terms × tf 10 → 2 posting rows, dl 20: Σdl is 10×
        // the posting rows, exactly the over-fragmentation input
        (i, (List.fill(10)(s"t${i}a") ++ List.fill(10)(s"t${i}b"))
          .mkString(" "))
      }.toDF("doc_id", "text")
      idx.append(docsOf(0L until 12L))
      idx.append(docsOf(12L until 24L))
      assert(idx.compactTiered(10) === 2)
      val merged = idx.segments.head
      // merged postings rows = 48 → ceil(48 / (2 buckets × 25)) = 1
      // file per bucket = 2 files; the old Σdl sizing (960) would have
      // spread them over ceil(960/50) = 20 salted tasks
      val postFiles = parquetFiles(s"$dir/$merged/postings")
      assert(postFiles.size <= 2, postFiles.map(_.getName).toString)
      // scores invariant (t56's contract, re-pinned here cheaply)
      val top = idx.topDocs(Seq((1L, "t3a t3b")), k = 1).collect()
      assert(top.length === 1 && top(0).getLong(1) === 3L)
    } finally spark.conf.unset("spark.graft.index.rowsPerFile")
  }

  test("maintainCompaction pays the full rewrite only past the tombstone-debt threshold (banded family)") {
    val idx = new EmbedIndex(spark, newDir("graft-r16-debt"), dim = 8,
      nPlanes = 4, bands = 2, nBuckets = 4)
    idx.append(mkVecs(0L until 40L, 8), "vec_id", "embedding")
    idx.append(mkVecs(40L until 80L, 8), "vec_id", "embedding")
    assert(idx.delete((0L until 10L).toDF("vec_id"), "vec_id") === 10L)
    // 10/80 dead = 12.5% < 20%: the tiered path runs, tombstones stay
    assert(idx.maintainCompaction() === false)
    assert(idx.segments.exists(_.startsWith("del-")))
    assert(idx.liveDocIds.count() === 70L)
    assert(idx.delete((10L until 25L).toDF("vec_id"), "vec_id") === 15L)
    // 25/80 dead = 31% > 20%: the full rewrite reclaims the debt
    assert(idx.maintainCompaction() === true)
    assert(idx.segments.size === 1)
    assert(!idx.segments.exists(_.startsWith("del-")))
    assert(idx.liveDocIds.count() === 55L)
  }

  test("maintainCompaction pays the full rewrite only past the tombstone-debt threshold (BM25)") {
    val dir = newDir("graft-r16-bmdebt")
    val idx = new Bm25Index(spark, dir, nBuckets = 4)
    def docsOf(ids: Seq[Long]) =
      ids.map(i => (i, s"alpha$i beta$i shared")).toDF("doc_id", "text")
    idx.append(docsOf(0L until 20L), "doc_id", "text")
    idx.append(docsOf(20L until 40L), "doc_id", "text")
    assert(idx.delete((0L until 5L).toDF("doc_id"), "doc_id") === 5L)
    assert(idx.maintainCompaction() === false) // 5/40 = 12.5%
    assert(idx.segments.exists(_.startsWith("del-")))
    assert(idx.delete((5L until 15L).toDF("doc_id"), "doc_id") === 10L)
    assert(idx.maintainCompaction() === true)  // 15/40 = 37.5%
    assert(idx.segments.size === 1)
    assert(!idx.segments.exists(_.startsWith("del-")))
    // scores over the reclaimed index see exactly the live corpus
    val top = idx.topDocs(Seq((1L, "alpha17")), k = 1).collect()
    assert(top.length === 1 && top(0).getLong(1) === 17L)
  }

  test("maintainCompaction pays the full rewrite only past the tombstone-debt threshold (IVF)") {
    val idx = new graft.storage.IvfIndex(spark, newDir("graft-r16-ivfdebt"),
      nCells = 4)
    def vecsOf(ids: Seq[Long]) = ids.map { id =>
      val rnd = new scala.util.Random(2000 + id)
      (id, Seq.fill(8)(rnd.nextGaussian()))
    }.toDF("vec_id", "v")
    idx.append(vecsOf(0L until 20L), "vec_id", "v")
    idx.append(vecsOf(20L until 40L), "vec_id", "v")
    assert(idx.delete((0L until 5L).toDF("vec_id"), "vec_id") === 5L)
    assert(idx.maintainCompaction() === false) // 5/40 = 12.5%
    assert(idx.segments.exists(_.startsWith("del-")))
    assert(idx.delete((5L until 15L).toDF("vec_id"), "vec_id") === 10L)
    assert(idx.maintainCompaction() === true)  // 15/40 = 37.5%
    assert(idx.segments.size === 1)
    assert(!idx.segments.exists(_.startsWith("del-")))
    // the compacted giant's _stats carries the LIVE count, so the debt
    // baseline is correct for the next cycle
    assert(idx.delete((15L until 20L).toDF("vec_id"), "vec_id") === 5L)
    assert(idx.maintainCompaction() === false) // 5/25 = 20%, not past
  }

  private implicit class AppendSugar(idx: Bm25Index) {
    def append(docs: org.apache.spark.sql.DataFrame): Unit =
      idx.append(docs, "doc_id", "text")
  }
}
