package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.functions.VectorFunctions.{l2Norm, nearestCentroids}

/** Persisted IVFADC index — PQ codes stored cell-partitioned under the
  * shared manifest lifecycle (VERDICT r16 missing #4): the
  * 8–32×-compressed representation that keeps 100 TB of embeddings
  * scannable, with [[IvfIndex]]'s inverted-file layout but CODES in
  * the cells instead of raw vectors (Jégou et al. TPAMI 2011, §IV —
  * the FAISS `IndexIVFPQ` shape, re-expressed as partitioned parquet
  * under a CAS manifest).
  *
  * [[graft.operators.Similarity.ivfadcTopK]] is the right OPERATOR for
  * one-shot search but re-trains, re-assigns and re-encodes the corpus
  * per call; here both quantizers are trained once (first append, the
  * [[IvfIndex]] freeze contract) and every vector is encoded once, at
  * append. A query probes `nProbe` cells driver-side from the tiny
  * centroid matrix and scans ONLY those cells' partitions of a table
  * that is M bytes per vector instead of 4·dim — the two compounding
  * reductions (cell pruning × code compression) that make the corpus
  * scannable at 100 TB. Exact re-ranking of the survivors is
  * [[graft.operators.Similarity.bruteForceTopK]] over ids this index
  * returns — deliberately out of scope here (the code table cannot
  * reconstruct vectors).
  *
  * Layout (all under `path/`):
  * {{{
  *   _centroids              nCells lines of comma-joined doubles
  *                           (frozen by the first append; versioned
  *                           through the manifest after [[retrain]])
  *   _codebooks              M·ksub lines "<m> <k> <v1,…,vsub>" —
  *                           the PQ codewords, frozen/versioned the
  *                           same way (codes under one head decode
  *                           only against that head's codebooks)
  *   _manifest.v<N>          one segment name per line (+ optional
  *                           `centroids=`/`codebooks=` version lines)
  *   seg-<n>-<tok>/codes/    (id, codes) parquet, partitioned by cell
  *   del-<n>-<tok>/ids/      tombstoned ids (manifest-order scoped)
  * }}}
  *
  * Lifecycle parity with the other four persisted indexes: atomic CAS
  * appends with `batchTag` idempotency, tombstone deletes with
  * range/bloom pruning + zero-hit tag markers, size-tiered partial
  * compaction (pure concatenation — cell assignment and codes are
  * frozen per head), tombstone-debt dispatch, full compact, vacuum.
  * [[retrain]] is the one call that differs: PQ codes are NOT
  * invertible, so refreshing the quantizers re-reads the SOURCE
  * corpus (the index is a derived structure; the caller owns the raw
  * vectors) — it re-trains both quantizers on the live subset,
  * re-encodes, and swaps matrix + codebooks + segment in ONE manifest
  * CAS so readers never pair codes with the wrong codebooks.
  *
  * Accuracy contract (the t48/t50 convention): ADC distances round to
  * 6 digits BEFORE ranking with an id tie-break, so a full probe
  * (nProbe = nCells) over an un-deleted corpus is row-identical to
  * the flat-ADC scan — the t76 driver gate pins exactly that through
  * two appends and a takedown. Recall < 1 at partial probe (unprobed
  * cells) and always through quantization error — the operator's
  * documented trade, spec-pinned.
  */
final class PqIvfIndex(
    spark: SparkSession, path: String, nCells: Int = 16,
    m: Int = 8, ksub: Int = 16,
    retainManifests: Int = 2, idBloomMaxIds: Long = 0L) {
  require(nCells > 0, "nCells must be positive")
  require(m > 0 && ksub > 1, "m and ksub must be positive (ksub > 1)")

  private val mf = new SegmentedManifest(
    new java.io.File(path), s"pqivf:$path", retainManifests)
  private def dir = mf.dir

  private def centroidsFile = new java.io.File(dir, "_centroids")
  private def codebooksFile = new java.io.File(dir, "_codebooks")

  private def readHead(): (Int, Seq[String]) = mf.readHead()
  private def isDel(name: String): Boolean = mf.isDel(name)

  private def segsOf(lines: Seq[String]): Seq[String] =
    lines.filterNot(l =>
      l.startsWith("centroids=") || l.startsWith("codebooks="))
  private def metaLines(lines: Seq[String]): Seq[String] =
    lines.filter(l =>
      l.startsWith("centroids=") || l.startsWith("codebooks="))

  private def centroidsFileOf(lines: Seq[String]): java.io.File =
    lines.find(_.startsWith("centroids="))
      .map(n => new java.io.File(dir, n.stripPrefix("centroids=")))
      .getOrElse(centroidsFile)
  private def codebooksFileOf(lines: Seq[String]): java.io.File =
    lines.find(_.startsWith("codebooks="))
      .map(n => new java.io.File(dir, n.stripPrefix("codebooks=")))
      .getOrElse(codebooksFile)

  /** The active centroid matrix, resolved through the manifest head
    * (None before the first append). */
  def centroids: Option[Seq[Seq[Double]]] = {
    val f = centroidsFileOf(readHead()._2)
    if (!f.exists()) None
    else Some(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      .linesIterator.filter(_.nonEmpty)
      .map(_.split(",").map(_.toDouble).toSeq).toSeq)
  }

  private def serializeCodebooks(cbs: Seq[Seq[Seq[Double]]]): String =
    cbs.zipWithIndex.flatMap { case (book, mm) =>
      book.zipWithIndex.map { case (w, k) =>
        s"$mm $k ${w.mkString(",")}"
      }
    }.mkString("", "\n", "\n")

  /** The active PQ codebooks (M × ksub × subDim), resolved through the
    * manifest head (None before the first append). */
  def codebooks: Option[Seq[Seq[Seq[Double]]]] = {
    val f = codebooksFileOf(readHead()._2)
    if (!f.exists()) None
    else {
      val rows = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        .linesIterator.filter(_.nonEmpty).map { l =>
          val Array(mm, k, vs) = l.split(" ", 3)
          (mm.toInt, k.toInt, vs.split(",").map(_.toDouble).toSeq)
        }.toSeq
      Some(rows.groupBy(_._1).toSeq.sortBy(_._1)
        .map(_._2.sortBy(_._2).map(_._3)))
    }
  }

  /** Committed segment names at the current head (spec surface). */
  def segments: Seq[String] = segsOf(readHead()._2)

  /** Tags of the batches committed at the head — the idempotency
    * surface, inherited across maintenance (tags union forward). */
  def committedBatchTags: Set[String] =
    segsOf(readHead()._2).flatMap(mf.tagsOf).toSet

  /** Append one batch as a new immutable segment of (id, codes) rows
    * partitioned by coarse cell. The FIRST successful append trains
    * and freezes both quantizers from its own batch ([[graft.operators
    * .Similarity.ivfTrain]] / [[graft.operators.Similarity.pqTrain]]'s
    * bounded deterministic samples) — or adopts `trainedCodebooks`
    * when supplied (externally-trained PQ, the FAISS pattern); later
    * appends encode against the frozen pair. Ids must be NEW;
    * `batchTag` short-circuits at-least-once replays. */
  def append(vecs: DataFrame, idCol: String, vecCol: String,
      batchTag: Option[String] = None,
      trainedCodebooks: Option[Seq[Seq[Seq[Double]]]] = None): Unit = {
    val (baseVer, lines) = readHead()
    val segs = segsOf(lines)
    if (batchTag.exists(t => segs.flatMap(mf.tagsOf).contains(t))) return
    val cents = centroids.getOrElse {
      val trained = graft.operators.Similarity.ivfTrain(
        vecs, idCol, vecCol, nCells)
      // losing this put is FINE (the IvfIndex rule): the winner's
      // matrix is just as valid a frozen basis — adopt it
      CasFiles.putIfAbsent(centroidsFile,
        trained.map(_.mkString(",")).mkString("", "\n", "\n")
          .getBytes("UTF-8"))
      centroids.get
    }
    val cbs = codebooks.getOrElse {
      val trained = trainedCodebooks.getOrElse(
        graft.operators.Similarity.pqTrain(vecs, idCol, vecCol, m, ksub))
      CasFiles.putIfAbsent(codebooksFile,
        serializeCodebooks(trained).getBytes("UTF-8"))
      codebooks.get
    }
    val seg = mf.newSegDir(baseVer + 1)
    // one narrow pass: assign + encode ride the write job; min/max/n
    // for the `_idrange` sidecar observe the same action (no extra
    // pass — the IvfIndex.append discipline)
    val obs = org.apache.spark.sql.Observation(
      s"graft-pqivf-${java.util.UUID.randomUUID()}")
    def shaped(v: DataFrame): DataFrame = v
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("cell",
        element_at(nearestCentroids(col("v"), cents, 1), 1))
      .select(col("id"),
        VectorFunctions.pqEncode(col("v"), cbs).as("codes"), col("cell"))
    shaped(vecs)
      .observe(obs, min(col("id")).as("mn"), max(col("id")).as("mx"),
        count(lit(1)).as("n"))
      .repartition(nCells, col("cell"))
      .write.partitionBy("cell").mode(SaveMode.Overwrite)
      .parquet(s"$seg/codes")
    SegmentIdRange.write(seg, SegmentIdRange.of("long",
      obs.get.getOrElse("mn", null), obs.get.getOrElse("mx", null)))
    val nAppended = obs.get.getOrElse("n", 0L) match {
      case l: java.lang.Long => l.longValue
      case _ => 0L
    }
    // zero-row dynamic-partition writes leave a fileless dir whose
    // later read dies in schema inference (the shared r13 rule)
    if (nAppended == 0L)
      shaped(vecs).limit(0).coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$seg/codes")
    if (idBloomMaxIds > 0L && nAppended > 0L)
      SegmentIdBloom.write(seg,
        spark.read.parquet(s"$seg/codes").select(col("id")),
        nAppended, idBloomMaxIds)
    // n + write-time bytes + rows for metadata-only planning; the
    // code table's row count IS its doc count
    mf.writeStats(seg, nAppended, 0L, nAppended)
    batchTag.foreach(mf.writeTag(seg, _))
    mf.commit(baseVer + 1,
      (lines :+ seg.getName).mkString("", "\n", "\n"), Seq(seg))
  }

  private def minusDeleted(
      rows: DataFrame, delSegs: Seq[(String, Int)]): DataFrame =
    if (delSegs.isEmpty) rows
    else {
      val dels = delSegs.map { case (s, i) =>
        spark.read.parquet(s"$path/$s/ids")
          .select(col("id").as("__did")).withColumn("__dord", lit(i))
      }.reduce(_.unionByName(_))
      rows.join(dels,
        rows("id") === dels("__did") && dels("__dord") > rows("__ord"),
        "left_anti")
    }

  private def liveCodes(entries: Seq[(String, Int)]): DataFrame = {
    val dataSegs = entries.filterNot(e => isDel(e._1))
    val delSegs = entries.filter(e => isDel(e._1))
    if (delSegs.isEmpty)
      dataSegs.map(e => spark.read.parquet(s"$path/${e._1}/codes"))
        .reduce(_.unionByName(_))
    else minusDeleted(
      dataSegs.map { case (s, i) =>
        spark.read.parquet(s"$path/$s/codes").withColumn("__ord", lit(i))
      }.reduce(_.unionByName(_)), delSegs).drop("__ord")
  }

  /** Live document ids at the head (the cross-index membership
    * surface); loud on an empty index. */
  def liveDocIds: DataFrame = {
    val entries = segsOf(readHead()._2).zipWithIndex
    require(entries.exists(e => !isDel(e._1)), s"empty PQ-IVF index at $path")
    liveCodes(entries).select(col("id"))
  }

  /** Tombstone vectors without rewriting a segment — the shared
    * delete contract: manifest-order scoping, range/bloom pruning,
    * pre-scan `batchTag` replay guard, zero-hit TAG MARKERS (ADVICE
    * r16), volume-sized id list with the one-file narrow coalesce.
    * Returns the count actually tombstoned. */
  def delete(ids: DataFrame, idCol: String,
      batchTag: Option[String] = None): Long = {
    val (baseVer, lines) = readHead()
    val entries = segsOf(lines).zipWithIndex
    if (batchTag.exists(t =>
        entries.map(_._1).flatMap(mf.tagsOf).contains(t))) return 0L
    val dataSegs = entries.filterNot(e => isDel(e._1))
    def marker(): Long = {
      batchTag.foreach { t =>
        val del = mf.newDelDir(baseVer + 1)
        spark.range(0).select(col("id"))
          .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$del/ids")
        mf.writeStats(del, 0L, 0L)
        mf.writeTag(del, t)
        mf.commit(baseVer + 1,
          (lines :+ del.getName).mkString("", "\n", "\n"), Seq(del))
      }
      0L
    }
    if (dataSegs.isEmpty) return marker()
    val want = ids.select(col(idCol).cast("long").as("id")).distinct()
    val r = want.agg(count(lit(1)).as("n"),
      min(col("id")).as("mn"), max(col("id")).as("mx")).collect()(0)
    if (r.getLong(0) == 0L) return marker()
    val req = SegmentIdRange.of("long", r.get(1), r.get(2))
    lazy val probe = SegmentIdBloom.probeIds(want, r.getLong(0))
    val scanSegs = dataSegs.filter { case (s, _) =>
      SegmentIdBloom.mayHold(new java.io.File(s"$path/$s"), req, probe)
    }
    if (scanSegs.isEmpty) return marker()
    val live = minusDeleted(
      scanSegs.map { case (s, i) =>
        spark.read.parquet(s"$path/$s/codes").select(col("id"))
          .withColumn("__ord", lit(i))
      }.reduce(_.unionByName(_)).join(want, Seq("id")),
      entries.filter(e => isDel(e._1)))
      .select(col("id")).distinct()
    // ONE job: the id-list write IS the counting action (observe —
    // the append discipline; r17: the separate count() was one more
    // job floor per delete). File count from the requested-id upper
    // bound; the one-file case stays a narrow coalesce.
    val del = mf.newDelDir(baseVer + 1)
    val nDelFiles = Bm25Index.delFiles(spark, r.getLong(0))
    val obs = org.apache.spark.sql.Observation(
      s"graft-pqdel-${java.util.UUID.randomUUID()}")
    val observed = live.observe(obs, count(lit(1)).as("n"))
    (if (nDelFiles == 1) observed.coalesce(1)
     else observed.repartition(nDelFiles))
      .write.mode(SaveMode.Overwrite).parquet(s"$del/ids")
    val nDel = obs.get.getOrElse("n", 0L) match {
      case l: java.lang.Long => l.longValue
      case _ => 0L
    }
    if (nDel == 0L) { mf.rmTree(del); return marker() }
    mf.writeStats(del, nDel, 0L)
    batchTag.foreach(mf.writeTag(del, _))
    mf.commit(baseVer + 1,
      (lines :+ del.getName).mkString("", "\n", "\n"), Seq(del))
    nDel
  }

  /** ADC top-`k` within the probed cells, reading ONLY those cells'
    * partitions of every segment — the persisted [[graft.operators
    * .Similarity.ivfadcTopK]]: probe cells come off the tiny centroid
    * matrix driver-side (so the cell set is a pushable literal),
    * distances are [[VectorFunctions.pqAdc]] against the head's
    * codebooks, rounded to 6 digits BEFORE ranking with an id
    * tie-break. `queries` must be driver-small (the broadcast-queries
    * contract of every ANN form here). */
  def topK(queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nProbe: Int): DataFrame = {
    require(k > 0, "k must be positive")
    require(nProbe >= 1 && nProbe <= nCells,
      s"nProbe must be in [1, $nCells]")
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val lines = readHead()._2
    val entries = segsOf(lines).zipWithIndex
    val dataSegs = entries.filterNot(e => isDel(e._1))
    val delSegs = entries.filter(e => isDel(e._1))
    require(dataSegs.nonEmpty, s"empty PQ-IVF index at $path")
    val cents = centroids.get
    val cbs = codebooks.get
    val q = queries.select(
      col(qidCol).cast("long").as("qid"), col(qvecCol).as("qv"))
    val collected = q
      .select(col("qid"), col("qv").cast("array<double>")).collect()
    val probes: Seq[(Long, Int)] = collected.toSeq.flatMap { r =>
      CentroidProbe.cells(r.getSeq[Double](1), cents, nProbe)
        .map(c => r.getLong(0) -> c)
    }
    // partition values parse back as INT — keep the literal exact
    val cells: Seq[Int] = probes.map(_._2).distinct
    val base =
      if (delSegs.isEmpty)
        dataSegs.map { case (s, _) =>
          spark.read.parquet(s"$path/$s/codes")
            .filter(col("cell").isin(cells: _*))
        }.reduce(_.unionByName(_))
      else minusDeleted(
        dataSegs.map { case (s, i) =>
          spark.read.parquet(s"$path/$s/codes")
            .filter(col("cell").isin(cells: _*)).withColumn("__ord", lit(i))
        }.reduce(_.unionByName(_)), delSegs).drop("__ord")
    val cand = base
      .join(broadcast(probes.toDF("qid", "cell")), Seq("cell"))
      .join(broadcast(q), Seq("qid"))
      .withColumn("adc", round(
        VectorFunctions.pqAdc(col("qv"), col("codes"), cbs), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adc").asc, col("id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("adc"), col("rank"))
  }

  /** Merge every committed segment into ONE (one file per cell),
    * folding tombstones physically — pure row movement: cell
    * assignment and codes are frozen per head, so the rewrite never
    * decodes anything. A fully-tombstoned compact publishes the EMPTY
    * index (quantizer files stay — the frozen basis for whatever
    * appends next); tags union forward. */
  def compact(): Unit = {
    val (baseVer, lines) = readHead()
    val entries = segsOf(lines).zipWithIndex
    val dataSegs = entries.filterNot(e => isDel(e._1))
    if (dataSegs.isEmpty) return
    if (dataSegs.size <= 1 && entries.size == dataSegs.size) return
    val seg = mf.newSegDir(baseVer + 1)
    // live row count rides the rewrite (observe — r17: was a count()
    // re-read of the just-written files), and doubles as the
    // emptiness test (no listing)
    val obs = org.apache.spark.sql.Observation(
      s"graft-pqcp-${java.util.UUID.randomUUID()}")
    liveCodes(entries)
      .observe(obs, count(lit(1)).as("n"))
      .repartition(nCells, col("cell"))
      .write.partitionBy("cell").mode(SaveMode.Overwrite)
      .parquet(s"$seg/codes")
    val n = obs.get.getOrElse("n", 0L) match {
      case l: java.lang.Long => l.longValue
      case _ => 0L
    }
    val wroteRows = n > 0L
    if (wroteRows) {
      SegmentIdRange.write(seg, dataSegs
        .map(e => SegmentIdRange.read(new java.io.File(s"$path/${e._1}")))
        .reduce(SegmentIdRange.union))
      mf.writeTags(seg, entries.map(_._1))
      if (idBloomMaxIds > 0L) SegmentIdBloom.write(seg,
        spark.read.parquet(s"$seg/codes").select(col("id")), n,
        idBloomMaxIds)
      mf.writeStats(seg, n, 0L, n)
    }
    val body = (metaLines(lines) ++
      (if (wroteRows) Seq(seg.getName) else Nil)).mkString("", "\n", "\n")
    if (!wroteRows) mf.rmTree(seg)
    mf.commit(baseVer + 1, body, Seq(seg))
  }

  /** The tier-merge groups a [[compactTiered]] at `mergeFactor` would
    * fold (spec surface). */
  private[graft] def tieredPlan(mergeFactor: Int): Seq[Seq[String]] =
    mf.tieredGroups(readHead()._2, mergeFactor)

  /** Size-tiered PARTIAL compaction — pure per-group concatenation
    * (the shared [[SegmentedManifest.tieredGroups]] policy); sizes
    * from summed `_stats` rows (count fallback for pre-upgrade
    * segments). Returns the number of segments folded. */
  def compactTiered(mergeFactor: Int = 10): Int = {
    val (baseVer, lines) = readHead()
    val groups = mf.tieredGroups(lines, mergeFactor)
    if (groups.isEmpty) return 0
    val builds = groups.map { g =>
      val seg = mf.newSegDir(baseVer + 1)
      val codes = g.map(s => spark.read.parquet(s"$path/$s/codes")
        .select(col("id"), col("codes"), col("cell")))
        .reduce(_.unionByName(_))
      val rowsFromStats = g.flatMap(mf.statsRows)
      val n = if (rowsFromStats.size == g.size) rowsFromStats.sum
              else codes.count()
      if (n == 0L)
        codes.limit(0).coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(s"$seg/codes")
      else codes
        .repartition(nCells, col("cell"))
        .write.partitionBy("cell").mode(SaveMode.Overwrite)
        .parquet(s"$seg/codes")
      SegmentIdRange.write(seg, g
        .map(s => SegmentIdRange.read(new java.io.File(s"$path/$s")))
        .reduce(SegmentIdRange.union))
      if (idBloomMaxIds > 0L && n > 0L) SegmentIdBloom.write(seg,
        spark.read.parquet(s"$seg/codes").select(col("id")), n,
        idBloomMaxIds)
      mf.writeStats(seg, n, 0L, n)
      mf.writeTags(seg, g)
      g -> seg
    }
    mf.commit(baseVer + 1,
      mf.spliceMerged(lines, builds.map { case (g, s) => (g, s.getName) })
        .mkString("", "\n", "\n"),
      builds.map(_._2))
    groups.map(_.size).sum
  }

  /** The debt-aware maintenance dispatch (the shared
    * [[SegmentedManifest.dispatchCompaction]] policy). Returns true
    * when the full compact ran. */
  def maintainCompaction(maxDelFraction: Double = 0.2,
      mergeFactor: Int = 10): Boolean =
    mf.dispatchCompaction(segsOf(readHead()._2), maxDelFraction)(
      compact())(compactTiered(mergeFactor): Unit)

  /** Refresh BOTH quantizers on the live subset of the SOURCE corpus
    * and re-encode — the drift lifecycle with the one PQ-specific
    * twist: codes cannot reconstruct vectors, so the caller supplies
    * the raw corpus this index derives from (`corpus` rows whose id is
    * not LIVE here are ignored; rows this index holds but the corpus
    * lost re-encode as absent — the index is a derived structure and
    * the source is the truth). New matrix + codebooks + the single
    * re-encoded segment publish as ONE manifest CAS, so readers never
    * pair codes with the wrong codebooks. */
  def retrain(corpus: DataFrame, idCol: String, vecCol: String): Unit = {
    val (baseVer, lines) = readHead()
    val entries = segsOf(lines).zipWithIndex
    require(entries.exists(e => !isDel(e._1)), s"empty PQ-IVF index at $path")
    val live = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .join(liveCodes(entries).select(col("id")), Seq("id"), "left_semi")
    val cents = graft.operators.Similarity.ivfTrain(live, "id", "v", nCells)
    require(cents.nonEmpty, s"retrain over an empty live corpus at $path")
    val cbs = graft.operators.Similarity.pqTrain(live, "id", "v", m, ksub)
    val tok = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val centFile = new java.io.File(dir, s"_centroids.v${baseVer + 1}-$tok")
    java.nio.file.Files.write(centFile.toPath,
      cents.map(_.mkString(",")).mkString("", "\n", "\n").getBytes("UTF-8"))
    val cbFile = new java.io.File(dir, s"_codebooks.v${baseVer + 1}-$tok")
    java.nio.file.Files.write(cbFile.toPath,
      serializeCodebooks(cbs).getBytes("UTF-8"))
    val seg = mf.newSegDir(baseVer + 1)
    val obs = org.apache.spark.sql.Observation(
      s"graft-pqivf-rt-${java.util.UUID.randomUUID()}")
    live
      .observe(obs, min(col("id")).as("mn"), max(col("id")).as("mx"),
        count(lit(1)).as("n"))
      .withColumn("cell",
        element_at(nearestCentroids(col("v"), cents, 1), 1))
      .select(col("id"),
        VectorFunctions.pqEncode(col("v"), cbs).as("codes"), col("cell"))
      .repartition(nCells, col("cell"))
      .write.partitionBy("cell").mode(SaveMode.Overwrite)
      .parquet(s"$seg/codes")
    SegmentIdRange.write(seg, SegmentIdRange.of("long",
      obs.get.getOrElse("mn", null), obs.get.getOrElse("mx", null)))
    val n = obs.get.getOrElse("n", 0L) match {
      case l: java.lang.Long => l.longValue
      case _ => 0L
    }
    mf.writeStats(seg, n, 0L, n)
    mf.writeTags(seg, entries.map(_._1))
    val body = s"centroids=${centFile.getName}\n" +
      s"codebooks=${cbFile.getName}\n${seg.getName}\n"
    try mf.commit(baseVer + 1, body, Seq(seg))
    catch {
      case e: CommitConflictException =>
        centFile.delete(); cbFile.delete(); throw e
    }
  }

  /** Current + previous retention; retired quantizer versions fall out
    * with the manifests that named them (the [[IvfIndex.vacuum]]
    * pattern for both files). */
  def vacuum(): Seq[String] = mf.vacuum { live =>
    val liveCents = live.filter(_.startsWith("centroids="))
      .map(_.stripPrefix("centroids="))
    val liveCbs = live.filter(_.startsWith("codebooks="))
      .map(_.stripPrefix("codebooks="))
    Option(dir.list()).toSeq.flatten.foreach { n =>
      if ((n.startsWith("_centroids.v") && !liveCents.contains(n)) ||
          (n.startsWith("_codebooks.v") && !liveCbs.contains(n)))
        new java.io.File(dir, n).delete(): Unit
    }
  }
}
