package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema._
import graft.storage.{GraphBackup, GraphStore}

/** Driver-oracle gates for the STORAGE surface (SURVEY.md §2.1) — the
  * multi-file provenance union, dup-tolerant COPY, SQL passthrough and
  * encrypted backup/restore rows were spec-verified only
  * (GraphEngineSpec/StorageOpsSpec); these gates put them on the same
  * hash-evidence footing as the read/write operators.
  *
  * Shape of every gate (the WriteQueries pattern): build a scratch
  * graph in a fresh temp dir, seed it deterministically from the sf
  * parquet (nation/region), exercise the storage primitive, then
  * RE-READ the stored state and return it. The DuckDB oracle replays
  * the same end state relationally over the ORIGINAL parquet — a hash
  * match proves the primitive rewrote storage to exactly the
  * relationally-predicted state (dedup keep-rule, anti-join survivor
  * set, round-trip identity), not merely that the call returned.
  *
  * Scale note: each primitive is one bounded shuffle (window dedup on
  * the key / anti-join on existing keys / per-table parquet copy) —
  * the tiny nation seed is gate plumbing, not the operator; the same
  * code paths carry the multi-GB staging loads (GraphEngineSpec covers
  * the loud strict-dup failure mode the gate can't return). */
object StorageQueries {

  private def pk = Property("identifier", GraftType.STRING, isPrimaryKey = true)

  /** Shared by the storage gates AND the s05 streaming-ingest gate —
    * one schema definition keeps the batch-vs-streaming ingest
    * comparisons like-for-like. */
  private[operators] def storageSchema = GraphSchema("storagegate", "1.0",
    Seq(
      NodeDef("Nation", Seq(pk, Property("nationkey", GraftType.INT64),
        Property("regionkey", GraftType.INT64))),
      NodeDef("Region", Seq(pk, Property("regionkey", GraftType.INT64)))),
    Seq(RelDef("NATION_IN_REGION", "Nation", "Region")))

  /** The parity split with nationkey 0 on BOTH sides — the shared
    * cross-file-duplicate fixture for st01 and s05. */
  private[operators] def paritySplit(rows: DataFrame): (DataFrame, DataFrame) = (
    rows.filter(col("nationkey") % 2 === 0),
    rows.filter(col("nationkey") % 2 === 1 || col("nationkey") === 0))

  /** Stable per-gate scratch dir, WIPED at entry (the StreamQueries
    * discipline): state must be fresh per invocation, but Bench's
    * warmup+3 passes and ScaleCheck invoke each gate repeatedly — a
    * fresh temp dir per call would grow /tmp without bound. */
  private def scratchDir(tag: String): java.nio.file.Path = {
    val base = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft-stgate", tag)
    rmTree(base.toFile)
    Files.createDirectories(base)
    base
  }

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete(); ()
  }

  private def scratch(spark: SparkSession, tag: String): GraphStore =
    new GraphStore(spark, scratchDir(tag).toString, "stgate", storageSchema)

  private def nationRows(spark: SparkSession, sfDir: String): DataFrame =
    graft.sources.Tables.nation(spark, sfDir).select(
      col("n_name").as("identifier"),
      col("n_nationkey").as("nationkey"),
      col("n_regionkey").as("regionkey"))

  /** st01: multi-file UNION ALL ingest with per-file `file_id`
    * provenance and cross-file dedup (manager.py:144-228). Two files
    * split the nation table by key parity with nationkey 0 present in
    * BOTH — the window dedup's deterministic keep (first by remaining
    * columns, file_id last) must retain the f0 copy. */
  def st01MultifileUnion(spark: SparkSession, sfDir: String): DataFrame = {
    val store = scratch(spark, "st01")
    val n = nationRows(spark, sfDir)
    val stage = scratchDir("st01-files")
    val f0 = s"$stage/f0"
    val f1 = s"$stage/f1"
    val (even, oddPlusDup) = paritySplit(n)
    even.coalesce(1).write.parquet(f0)
    oddPlusDup.coalesce(1).write.parquet(f1)
    store.ingestNodeFiles("Nation", Seq(f0 -> "f0", f1 -> "f1"))
    store.node("Nation")
      .select(col("identifier"), col("nationkey"), col("regionkey"),
        col(store.FileIdCol))
      .orderBy(col("identifier"))
  }

  /** st02: dup-tolerant COPY (`ignoreErrors = true`, ingest.py:588-665)
    * — a second batch carrying conflicting values for existing keys
    * plus genuinely new keys. The anti-join must drop every existing
    * key (stored values win — the batch's regionkey=99 rewrite of the
    * region-0 nations must NOT land) and append only the new rows,
    * stamped with the batch's file_id. */
  def st02CopyIgnoreErrors(spark: SparkSession, sfDir: String): DataFrame = {
    val store = scratch(spark, "st02")
    store.ingestNodes("Nation", nationRows(spark, sfDir))
    val batch = nationRows(spark, sfDir)
      .filter(col("regionkey") === 0)
      .withColumn("regionkey", lit(99L))
      .unionByName(spark.range(2).select(
        concat(lit("NEWLAND_"), col("id")).as("identifier"),
        (col("id") + 90L).as("nationkey"),
        lit(99L).as("regionkey")))
    store.ingestNodes("Nation", batch, Some("batch2"), ignoreErrors = true)
    store.node("Nation")
      .select(col("identifier"), col("nationkey"), col("regionkey"),
        col(store.FileIdCol))
      .orderBy(col("identifier"))
  }

  /** st03: SQL passthrough over the staged graph tables
    * (registerViews + spark.sql — the reference's staging-layer SQL
    * escape hatch). The SQL runs against the STORE's materialized
    * views, so a hash match proves view registration reads the same
    * state the ingest wrote, not just that Spark can run SQL. */
  def st03SqlPassthrough(spark: SparkSession, sfDir: String): DataFrame = {
    val store = scratch(spark, "st03")
    store.ingestNodes("Nation", nationRows(spark, sfDir))
    store.ingestNodes("Region", graft.sources.Tables.region(spark, sfDir)
      .select(col("r_name").as("identifier"), col("r_regionkey").as("regionkey")))
    store.registerViews()
    spark.sql(
      """SELECT r.identifier AS region,
                count(*) AS n_nations,
                sum(n.nationkey) AS sum_key
         FROM Nation n JOIN Region r ON n.regionkey = r.regionkey
         GROUP BY r.identifier
         ORDER BY region""")
  }

  /** st04: encrypted backup → restore round trip
    * (GraphBackup.exportGraphEncrypted / importGraphEncrypted,
    * AES-256-GCM + manifest digests). The restored store is a FRESH
    * GraphStore fed only by the ciphertext archive; returning its
    * re-read node+rel join proves the round trip is lossless through
    * encryption, sealing, digest verification and decryption —
    * tamper/wrong-password failure modes are StorageOpsSpec's. */
  def st04BackupRestore(spark: SparkSession, sfDir: String): DataFrame = {
    val store = scratch(spark, "st04")
    store.ingestNodes("Nation", nationRows(spark, sfDir))
    store.ingestNodes("Region", graft.sources.Tables.region(spark, sfDir)
      .select(col("r_name").as("identifier"), col("r_regionkey").as("regionkey")))
    val n = store.node("Nation")
    val r = store.node("Region")
    // arrive as from/to — the reference's wire names — so the gate's
    // hash also covers ingestRels' src/dst rename (manager.py:124-135)
    store.ingestRels("NATION_IN_REGION",
      n.join(r, n("regionkey") === r("regionkey"))
        .select(n("identifier").as("from"), r("identifier").as("to")))
    val archive = scratchDir("st04-backup").toString
    GraphBackup.exportGraphEncrypted(store, archive, "gate-password")
    val restored = scratch(spark, "st04-restored")
    GraphBackup.importGraphEncrypted(restored, archive, "gate-password")
    val rn = restored.node("Nation")
    val rels = restored.rel("NATION_IN_REGION")
    rn.join(rels, rn("identifier") === rels("src"))
      .select(col("identifier"), col("nationkey"), col("dst").as("region"))
      .orderBy(col("identifier"))
  }

  /** st05: XLSX upload staging end-to-end — the gate ASSEMBLES a real
    * OOXML workbook from the sf nation rows (ZipOutputStream +
    * spreadsheet XML, inline strings + numeric cells), stages it
    * through the pure-JDK `storage/XlsxReader`, ingests via
    * `FileStaging.ingestNodeFile`, and returns the stored state. A
    * hash match proves the zip/StAX/typing/staging/ingest chain
    * round-trips user uploads losslessly (malformed-cell edge cases
    * are StorageOpsSpec's). The 25-row collect is gate plumbing —
    * real uploads stream through the same reader partition-wise. */
  def st05XlsxStaging(spark: SparkSession, sfDir: String): DataFrame = {
    val store = scratch(spark, "st05")
    val rows = nationRows(spark, sfDir)
      .select(col("identifier"), col("nationkey").cast("long"),
        col("regionkey").cast("long"))
      .orderBy(col("nationkey")).collect()
    def esc(s: String) =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val body = rows.zipWithIndex.map { case (r, i) =>
      s"""<row r="${i + 2}"><c t="inlineStr"><is><t>${esc(r.getString(0))}</t></is></c>""" +
        s"""<c><v>${r.getLong(1)}</v></c><c><v>${r.getLong(2)}</v></c></row>"""
    }.mkString
    val sheet =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c t="inlineStr"><is><t>identifier</t></is></c>""" +
        """<c t="inlineStr"><is><t>nationkey</t></is></c>""" +
        """<c t="inlineStr"><is><t>regionkey</t></is></c></row>""" +
        body + "</sheetData></worksheet>"
    val dir = scratchDir("st05-upload")
    val path = s"$dir/nations.xlsx"
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    try {
      zos.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
      zos.write(sheet.getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
    graft.storage.FileStaging.ingestNodeFile(store, "Nation", path, "upload1")
    store.node("Nation")
      .select(col("identifier"), col("nationkey"), col("regionkey"),
        col(store.FileIdCol))
      .orderBy(col("identifier"))
  }

  /** st07: legacy .xls upload staging end-to-end — the gate assembles
    * a REAL BIFF8 workbook in a CFB mini-stream container from the sf
    * nation rows, stages it through the pure-JDK
    * `storage/XlsReader` (CFB FAT/miniFAT chains, BIFF records),
    * ingests, and hash-compares the stored state. With st05 this puts
    * BOTH Excel upload formats on identical hash evidence. */
  def st07XlsStaging(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.storage.BiffBytes._
    val store = scratch(spark, "st07")
    val rows = nationRows(spark, sfDir)
      .select(col("identifier"), col("nationkey").cast("long"),
        col("regionkey").cast("long"))
      .orderBy(col("nationkey")).collect()
    val header = label(0, 0, "identifier") ++ label(0, 1, "nationkey") ++
      label(0, 2, "regionkey")
    val cells = rows.zipWithIndex.foldLeft(header) { case (acc, (r, i)) =>
      acc ++ label(i + 1, 0, r.getString(0)) ++
        number(i + 1, 1, r.getLong(1).toDouble) ++
        number(i + 1, 2, r.getLong(2).toDouble)
    }
    val dir = scratchDir("st07-upload")
    val path = s"$dir/nations.xls"
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      cfbMini(workbook(Array.empty[Byte], cells)))
    graft.storage.FileStaging.ingestNodeFile(store, "Nation", path, "upload2")
    store.node("Nation")
      .select(col("identifier"), col("nationkey"), col("regionkey"),
        col(store.FileIdCol))
      .orderBy(col("identifier"))
  }

  /** st06: NDJSON result-sink round trip — the chunked streaming
    * serializer (`serve/ResultStreamer.ndjsonChunks`, the §2.1 result
    * cursor) applied to a live aggregate, then re-parsed. A hash match
    * proves the wire format preserves every value and type the query
    * produced — the serializer is lazy/chunked (toLocalIterator), so
    * this is the driver-paging path large results take. */
  def st06NdjsonRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = spark.sql(
      """SELECT r_name AS region, count(*) AS n_nations,
               CAST(sum(n_nationkey) AS BIGINT) AS sum_key
        FROM parquet.`%s/nation.parquet` n
        JOIN parquet.`%s/region.parquet` r ON n.n_regionkey = r.r_regionkey
        GROUP BY r_name""".format(sfDir, sfDir))
    val lines = graft.serve.ResultStreamer.ndjsonChunks(agg, chunkSize = 2)
      .flatten.toSeq
    import spark.implicits._
    spark.read.json(spark.createDataset(lines))
      .select(col("region"), col("n_nations"), col("sum_key"))
      .orderBy(col("region"))
  }

  /** st08: SSE result-sink round trip — the same live-aggregate
    * pattern as st06 but through the EVENT-FRAMED path
    * (`serve/ResultStreamer.sseEvents`; reference protocol
    * routers/graphs/query/streaming.py:236-455): every frame must be a
    * well-formed `event: <name>\ndata: <payload>\n\n` block, the data
    * events reassemble to exactly the query's rows, and the terminal
    * `done` event's row count must equal what the data frames carried.
    * A hash match proves the SSE framing is value-transparent — the
    * last §2.9 result surface that was spec-only. */
  def st08SseRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = spark.sql(
      """SELECT o_orderpriority AS priority, count(*) AS n_orders,
               CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS sum_price,
               CAST(max(o_orderdate) AS STRING) AS last_date
        FROM parquet.`%s/orders.parquet`
        GROUP BY o_orderpriority""".format(sfDir))
    val frames = graft.serve.ResultStreamer.sseEvents(agg, chunkSize = 2)
      .map { e =>
        // strict wire-format check, not a lenient scrape: the gate is
        // about the framing as much as the values
        val m = "(?s)^event: ([a-z]+)\ndata: (.*)\n\n$".r
          .findFirstMatchIn(e).getOrElse(
            throw new IllegalStateException(s"malformed SSE frame: $e"))
        (m.group(1), m.group(2))
      }.toSeq
    require(frames.nonEmpty && frames.last._1 == "done",
      s"SSE stream must end with a done event: ${frames.map(_._1)}")
    val declared = """\{"rows":(\d+)\}""".r
      .findFirstMatchIn(frames.last._2).map(_.group(1).toLong)
      .getOrElse(throw new IllegalStateException(
        s"malformed done payload: ${frames.last._2}"))
    val payloads = frames.init.map { case (n, p) =>
      require(n == "data", s"unexpected $n event before done"); p }
    import spark.implicits._
    // each payload is one JSON array of row objects; Spark's JSON
    // reader explodes root-level arrays into rows
    val back = spark.read.json(spark.createDataset(payloads))
      .select(col("priority"), col("n_orders"), col("sum_price"), col("last_date"))
    require(back.count() == declared,
      s"done declared $declared rows but data frames carried ${back.count()}")
    back.orderBy(col("priority"))
  }

  /** st09: snapshot generations + time travel under the oracle. Two
    * rewrites run against a seeded store — a property SET (rewrite →
    * `_gen-1`) then a DETACH DELETE (rewrite → `_gen-2`) — and the
    * gate returns the CURRENT state unioned with the time-traveled
    * PREVIOUS generation (`GraphStore.nodeAt`). A hash match proves
    * the pointer swap activates exactly the new state, retention
    * really keeps the prior snapshot bit-for-bit, and time travel
    * reads it — the storage semantics a transactional table format's
    * log would give, replayed relationally by DuckDB. */
  def st09SnapshotTimetravel(spark: SparkSession, sfDir: String): DataFrame = {
    val store = scratch(spark, "st09")
    store.ingestNodes("Nation", nationRows(spark, sfDir))
    // rewrite 1 → _gen-1: SET regionkey += 100 on even keys (updates
    // derive from the SOURCE parquet, not the table being rewritten —
    // the caller-must-materialize contract)
    store.updateNodeProps("Nation",
      nationRows(spark, sfDir).filter(col("nationkey") % 2 === 0)
        .select(col("identifier").as("__key"),
          (col("regionkey") + 100L).as("regionkey")))
    // rewrite 2 → _gen-2: DETACH DELETE the high keys
    store.deleteNodes("Nation",
      nationRows(spark, sfDir).filter(col("nationkey") >= 20)
        .select(col("identifier")), detach = true)
    val cols = Seq(col("identifier"), col("nationkey"), col("regionkey"))
    store.node("Nation").select(lit("current").as("snap") +: cols: _*)
      .unionByName(
        store.nodeAt("Nation", 1).select(lit("previous").as("snap") +: cols: _*))
      .orderBy(col("snap"), col("identifier"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st01_multifile_union" -> (st01MultifileUnion(_, _)),
    "st02_copy_ignore_errors" -> (st02CopyIgnoreErrors(_, _)),
    "st03_sql_passthrough" -> (st03SqlPassthrough(_, _)),
    "st04_backup_restore" -> (st04BackupRestore(_, _)),
    "st05_xlsx_staging" -> (st05XlsxStaging(_, _)),
    "st06_ndjson_roundtrip" -> (st06NdjsonRoundtrip(_, _)),
    "st07_xls_staging" -> (st07XlsStaging(_, _)),
    "st08_sse_roundtrip" -> (st08SseRoundtrip(_, _)),
    "st09_snapshot_timetravel" -> (st09SnapshotTimetravel(_, _)))

  /** DuckDB replay of each gate's stored end state. */
  val oracle: Map[String, String] = Map(
    // dedup keep rule: first row by the remaining columns with file_id
    // ordered last — for the duplicated nationkey 0 both copies carry
    // identical values, so 'f0' < 'f1' decides.
    "st01_multifile_union" ->
      """WITH u AS (
           SELECT n_name AS identifier, n_nationkey AS nationkey,
                  n_regionkey AS regionkey, 'f0' AS file_id
           FROM nation WHERE n_nationkey % 2 = 0
           UNION ALL
           SELECT n_name, n_nationkey, n_regionkey, 'f1'
           FROM nation WHERE n_nationkey % 2 = 1 OR n_nationkey = 0
         ), d AS (
           SELECT *, row_number() OVER
             (PARTITION BY identifier
              ORDER BY nationkey, regionkey, file_id) AS rn
           FROM u)
         SELECT identifier, nationkey, regionkey, file_id
         FROM d WHERE rn = 1 ORDER BY identifier""",
    // existing keys keep their SEEDED values (file_id NULL, original
    // regionkey); only the two new keys land, stamped 'batch2'.
    "st02_copy_ignore_errors" ->
      """SELECT n_name AS identifier, n_nationkey AS nationkey,
                n_regionkey AS regionkey, CAST(NULL AS VARCHAR) AS file_id
         FROM nation
         UNION ALL
         SELECT 'NEWLAND_0', 90, 99, 'batch2'
         UNION ALL
         SELECT 'NEWLAND_1', 91, 99, 'batch2'
         ORDER BY identifier""",
    "st03_sql_passthrough" ->
      """SELECT r_name AS region, count(*) AS n_nations,
                CAST(sum(n_nationkey) AS BIGINT) AS sum_key
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY region""",
    "st04_backup_restore" ->
      """SELECT n_name AS identifier, n_nationkey AS nationkey,
                r_name AS region
         FROM nation JOIN region ON n_regionkey = r_regionkey
         ORDER BY identifier""",
    "st05_xlsx_staging" ->
      """SELECT n_name AS identifier, n_nationkey AS nationkey,
                n_regionkey AS regionkey, 'upload1' AS file_id
         FROM nation ORDER BY identifier""",
    "st06_ndjson_roundtrip" ->
      """SELECT r_name AS region, count(*) AS n_nations,
                CAST(sum(n_nationkey) AS BIGINT) AS sum_key
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY region""",
    "st07_xls_staging" ->
      """SELECT n_name AS identifier, n_nationkey AS nationkey,
                n_regionkey AS regionkey, 'upload2' AS file_id
         FROM nation ORDER BY identifier""",
    "st08_sse_roundtrip" ->
      """SELECT o_orderpriority AS priority,
                count(*) AS n_orders,
                CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS sum_price,
                CAST(max(o_orderdate) AS VARCHAR) AS last_date
         FROM orders GROUP BY o_orderpriority ORDER BY priority""",
    // g1 = post-SET snapshot (all rows, evens +100); current = g1
    // minus the deleted high keys
    "st09_snapshot_timetravel" ->
      """WITH g1 AS (
           SELECT n_name AS identifier, n_nationkey AS nationkey,
                  CASE WHEN n_nationkey % 2 = 0 THEN n_regionkey + 100
                       ELSE n_regionkey END AS regionkey
           FROM nation)
         SELECT 'current' AS snap, identifier, nationkey, regionkey
         FROM g1 WHERE nationkey < 20
         UNION ALL
         SELECT 'previous', identifier, nationkey, regionkey FROM g1
         ORDER BY snap, identifier""")
}
