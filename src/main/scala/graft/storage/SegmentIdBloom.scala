package graft.storage

import org.apache.spark.sql.DataFrame
import org.apache.spark.util.sketch.BloomFilter

/** Per-segment id BLOOM sidecar (`_idbloom`) — the content-addressed
  * complement to [[SegmentIdRange]] for takedown pruning. The range
  * sidecar prunes takedowns that are CLUSTERED in id space (a cohort,
  * a crawl batch); a SCATTERED id list (a regulatory takedown drawn
  * from across the corpus's history) overlaps every segment's
  * [min, max] and the range test prunes nothing. The bloom answers the
  * same "can this segment hold any requested id?" question by content:
  * a "no" is exact (skip is provable), a "maybe" only costs the scan
  * the index would have done anyway — advisory-safe in both
  * directions, like the range (absent/corrupt/oversized → scan).
  *
  * Cost model, and why this is OPT-IN (`idBloomMaxIds = 0` default):
  * building the filter is one extra narrow aggregation over the
  * batch's id column per append (Spark's distributed
  * `stat.bloomFilter` — never a driver-side id collection), and the
  * file is ~0.9 MB per million ids at 3% fpp. That is the right trade
  * for a takedown-heavy corpus with many per-trigger segments, and
  * the wrong one for an append-mostly corpus that never deletes —
  * the caller opts in per index handle. Segments larger than the cap
  * write no bloom (a multi-GB sidecar read per delete would cost more
  * than the scan it skips); compaction likewise writes none — a
  * compacted head is dominated by its one large segment, and the
  * bloom's value is skipping the MANY small per-trigger segments,
  * which later appends re-create with fresh blooms.
  *
  * Probe side: the requested ids are collected once per delete call
  * (bounded by `ProbeMaxIds`; a larger takedown skips bloom pruning
  * and falls back to range+scan — collecting millions of ids to the
  * driver to save executor scans would invert the economics). Only
  * string and integral id types build filters, mirroring
  * [[SegmentIdRange]]'s comparable-types rule: Spark's BloomFilter
  * hashes exactly those natively, so the put/probe representations
  * provably agree. */
private[graft] object SegmentIdBloom {
  val FileName = "_idbloom"

  /** Largest requested-id set a delete will collect driver-side to
    * probe blooms with; beyond it bloom pruning is skipped. */
  val ProbeMaxIds = 100000L

  private val Fpp = 0.03

  private def supported(typeName: String): Boolean = typeName match {
    case "string" | "byte" | "short" | "integer" | "long" => true
    case _ => false
  }

  /** Build-and-write in one step: one distributed aggregation over
    * `df`'s `id` column. No-op (no file) when the index opted out
    * (`maxIds <= 0`), the segment exceeds the cap, the id type is
    * unsupported, or the frame is empty. */
  def write(segDir: java.io.File, df: DataFrame, nIds: Long,
      maxIds: Long): Unit = {
    if (maxIds <= 0L || nIds <= 0L || nIds > maxIds) return
    if (!supported(df.schema("id").dataType.typeName)) return
    val bf = df.stat.bloomFilter("id", nIds, Fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    java.nio.file.Files.write(
      new java.io.File(segDir, FileName).toPath, out.toByteArray)
  }

  /** Hard ceiling on a readable `_idbloom` file. The write side never
    * produces one this large (at 3% fpp a filter is ~0.9 MB per
    * million ids, so 128 MB covers ~140 M ids — far past any sane
    * `idBloomMaxIds`, whose economics break down well before that);
    * a bigger file is foreign or corrupt and must degrade to "scan"
    * WITHOUT being slurped into driver memory first (ADVICE r14 —
    * the 'oversized → scan' promise previously held only at write
    * time). */
  private val MaxFileBytes = 128L << 20

  /** Read a segment's bloom; ANY defect — including a file above
    * [[MaxFileBytes]], checked BEFORE reading a byte — degrades to
    * None (= scan). */
  def read(segDir: java.io.File): Option[BloomFilter] =
    try {
      val f = new java.io.File(segDir, FileName)
      if (!f.exists || f.length() > MaxFileBytes) None
      else Some(BloomFilter.readFrom(new java.io.ByteArrayInputStream(
        java.nio.file.Files.readAllBytes(f.toPath))))
    } catch { case _: Exception => None }

  /** The delete-side probe set: the requested ids (already cast to the
    * segment id type and deduped) collected once, iff the count is
    * within [[ProbeMaxIds]] and the type is supported. None = bloom
    * pruning disabled for this call. */
  def probeIds(want: DataFrame, n: Long): Option[Seq[Any]] =
    if (n <= 0L || n > ProbeMaxIds ||
      !supported(want.schema("id").dataType.typeName)) None
    else Some(want.collect().map(_.get(0)).toSeq)

  /** The one delete-pruning predicate all three indexes share: range
    * first (free — two comparisons off a 3-line sidecar), then bloom
    * (forces the by-name probe set only if a bloom file exists). A
    * segment passing both may hold a requested id and must be
    * scanned; failing either provably cannot. */
  def mayHold(segDir: java.io.File,
      req: Option[(String, String, String)],
      probe: => Option[Seq[Any]]): Boolean =
    SegmentIdRange.mayOverlap(SegmentIdRange.read(segDir), req) &&
      mayContain(segDir, probe)

  /** Can this segment hold any of `ids`? True when the segment has no
    * (readable) bloom or the call has no probe set — pruning must
    * never invent a skip it cannot prove. `ids` is BY-NAME so a
    * delete against an index with no blooms at all (the default-off
    * handle) never pays the probe-set collection: the bloom file is
    * checked first, and only an existing bloom forces the ids. */
  def mayContain(segDir: java.io.File,
      ids: => Option[Seq[Any]]): Boolean =
    read(segDir) match {
      case Some(bf) => ids match {
        case Some(vs) => vs.exists(v => v != null && bf.mightContain(v))
        case None => true
      }
      case None => true
    }
}
