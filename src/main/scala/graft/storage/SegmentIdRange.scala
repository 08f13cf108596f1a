package graft.storage

import org.apache.spark.unsafe.types.UTF8String

/** Per-segment id min/max sidecar (`_idrange`) for the persisted
  * indexes: a takedown's id-filtered scan previously touched EVERY
  * posting/vector segment because ids are not the partition key
  * (the r13 documented read-bill trade). Appends and compactions now
  * record the segment's id range next to its stats, and
  * [[Bm25Index.delete]] / [[IvfIndex.delete]] skip segments whose
  * range is disjoint from the requested id set — Lucene's per-segment
  * field-stats idea applied to the doc-id axis. The sidecar is
  * advisory-safe in both directions: absent or uncomparable → the
  * segment is scanned (pre-r14 segments keep working), present →
  * pruning compares in exactly the ordering Spark's own min/max agg
  * produced the bounds with, so a skipped segment provably holds no
  * requested id. The write bill is one driver-side file per segment;
  * the bounds come off aggregates the write path already runs (or an
  * `observe` on the write job itself), never an extra data pass.
  *
  * File format (3 lines): Spark `DataType.typeName`, base64(min),
  * base64(max) — base64 keeps string ids containing newlines honest.
  * Only integral, fractional and string id types are comparable here;
  * anything else never writes a file (= never prunes). */
private[graft] object SegmentIdRange {
  val FileName = "_idrange"

  /** Driver-side comparator matching Spark's column ordering for the
    * given `DataType.typeName`: UTF8String binary order for strings
    * (Java String compareTo differs on supplementary characters),
    * numeric order for integral/fractional. None = uncomparable. */
  private def cmpFor(typeName: String): Option[(String, String) => Int] =
    typeName match {
      case "string" => Some((a, b) =>
        UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))
      case "byte" | "short" | "integer" | "long" =>
        Some((a, b) => java.lang.Long.compare(a.toLong, b.toLong))
      case "float" | "double" =>
        Some((a, b) => java.lang.Double.compare(a.toDouble, b.toDouble))
      case _ => None
    }

  private def b64(s: String): String = java.util.Base64.getEncoder
    .encodeToString(s.getBytes("UTF-8"))
  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  /** A comparable (typeName, min, max) from a Spark min/max agg row —
    * None when the type is uncomparable or the frame was empty (null
    * aggregates), in which case nothing is written and nothing ever
    * prunes. */
  def of(typeName: String, minV: Any, maxV: Any): Option[(String, String, String)] =
    if (minV == null || maxV == null || cmpFor(typeName).isEmpty) None
    else Some((typeName, minV.toString, maxV.toString))

  def write(segDir: java.io.File,
      range: Option[(String, String, String)]): Unit =
    range.foreach { case (t, mn, mx) =>
      java.nio.file.Files.write(new java.io.File(segDir, FileName).toPath,
        s"$t\n${b64(mn)}\n${b64(mx)}\n".getBytes("UTF-8"))
    }

  def read(segDir: java.io.File): Option[(String, String, String)] =
    // ANY defect — missing, truncated, invalid base64 — degrades to
    // None (= always scan): the sidecar is advisory, and a takedown
    // must never hard-fail on a corrupt hint file
    try {
      val f = new java.io.File(segDir, FileName)
      if (!f.exists) None
      else {
        val ls = new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
          .linesIterator.toSeq
        if (ls.size < 3) None else Some((ls(0), unb64(ls(1)), unb64(ls(2))))
      }
    } catch { case _: Exception => None }

  /** Range union (a compacted segment inherits its constituents' —
    * conservative: tombstoned ids may narrow the true range, a
    * superset only costs scans). None if either side is unknown or
    * the types disagree. */
  def union(a: Option[(String, String, String)],
      b: Option[(String, String, String)]): Option[(String, String, String)] =
    (a, b) match {
      case (Some((ta, amn, amx)), Some((tb, bmn, bmx))) if ta == tb =>
        cmpFor(ta).map { c =>
          (ta, if (c(amn, bmn) <= 0) amn else bmn,
            if (c(amx, bmx) >= 0) amx else bmx)
        }
      case _ => None
    }

  /** Can a segment with range `seg` hold any id in `req`? True when
    * either side is unknown or the types disagree — pruning must
    * never invent a skip it cannot prove. */
  def mayOverlap(seg: Option[(String, String, String)],
      req: Option[(String, String, String)]): Boolean =
    (seg, req) match {
      case (Some((ts, smn, smx)), Some((tr, rmn, rmx))) if ts == tr =>
        cmpFor(ts).forall(c => !(c(smx, rmn) < 0 || c(smn, rmx) > 0))
      case _ => true
    }
}
