package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable.{ArrayBuffer, ListBuffer}

/** Minimal legacy .xls (BIFF8) reader on pure JDK — closes the last
  * gap of the reference's upload surface (its pandas path accepts
  * binary Excel, data_tools.py:222-259). Two public formats stack
  * here:
  *
  *  - the container is CFB ("Compound File Binary", MS-CFB): 512-byte
  *    sectors, a FAT of sector chains, a directory of streams, and a
  *    64-byte-sector mini-stream for streams under 4096 bytes;
  *  - the `Workbook` stream is BIFF8 (MS-XLS): length-prefixed records
  *    — globals substream (BOF, SST shared strings, BOUNDSHEET sheet
  *    offsets, EOF) followed by per-sheet substreams (BOF, cell
  *    records, EOF).
  *
  * Scope (the upload-endpoint subset, deliberately): first worksheet;
  * BIFF8 only (BIFF5's non-unicode strings are rejected loudly);
  * LABELSST / LABEL / NUMBER / RK / MULRK / BOOLERR cells; SST
  * Continue-record splits handled (the flags byte restarts at each
  * continuation, so a string can switch between compressed and UTF-16
  * mid-stream — the documented BIFF quirk). FORMULA cells, encrypted
  * workbooks (FILEPASS) and error cells fail with a clear message
  * rather than silently mis-reading — uploads are untrusted bytes and
  * a wrong value is worse than a rejection. Row/typing semantics are
  * EXACTLY the XLSX path's ([[XlsxReader.sheetToDataFrame]]), so a
  * re-saved workbook stages identically in either format.
  *
  * Scale judgment: same as XLSX — uploads are small single files; the
  * driver parses, Spark distributes. Columnar bulk data enters via
  * parquet, never spreadsheets. */
object XlsReader {

  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect = 0xFFFFFFFF

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  // ---- CFB container -----------------------------------------------------

  /** Extract a named stream ("Workbook"/"Book") from a CFB file. */
  private def cfbStream(b: Array[Byte], names: Set[String], path: String): Array[Byte] = {
    require(b.length >= 512 &&
      (b(0) & 0xff) == 0xD0 && (b(1) & 0xff) == 0xCF && (b(2) & 0xff) == 0x11 &&
      (b(3) & 0xff) == 0xE0 && (b(4) & 0xff) == 0xA1 && (b(5) & 0xff) == 0xB1 &&
      (b(6) & 0xff) == 0x1A && (b(7) & 0xff) == 0xE1,
      s"not a CFB (OLE2) file: $path")
    val sectorSize = 1 << u16(b, 30)
    require(sectorSize == 512 || sectorSize == 4096,
      s"unsupported CFB sector size $sectorSize in $path")
    val miniSize = 1 << u16(b, 32) // 64
    val firstDir = i32(b, 48)
    val miniCutoff = i32(b, 56) // 4096
    val firstMiniFat = i32(b, 60)
    val firstDifat = i32(b, 68)
    require(firstDifat == EndOfChain || firstDifat == FreeSect,
      s"chained DIFAT (>6.8 MB FAT) not supported in $path")
    def sector(id: Int): Array[Byte] = {
      // Long math + an explicit bound: a hostile header can name any
      // sector id, and raw AIOOBE lacks the path-tagged message every
      // other validation here carries
      require(id >= 0 && (id.toLong + 2L) * sectorSize <= b.length,
        s"sector $id outside the file (corrupt CFB header?) in $path")
      java.util.Arrays.copyOfRange(b, (id + 1) * sectorSize,
        (id + 2) * sectorSize)
    }
    val intsPerSector = sectorSize / 4
    // header DIFAT: up to 109 FAT sector ids
    val fatSectors = (0 until 109).map(i => i32(b, 76 + 4 * i))
      .filter(s => s != FreeSect && s != EndOfChain)
    val fat: Array[Int] = fatSectors.toArray.flatMap { fs =>
      val sb = sector(fs); (0 until intsPerSector).map(i => i32(sb, 4 * i))
    }
    def chain(start: Int, table: Array[Int]): Seq[Int] = {
      val out = ListBuffer.empty[Int]
      var s = start
      var guard = 0
      while (s != EndOfChain) {
        // FREESECT mid-chain = truncated/corrupt container; silently
        // stopping here would ingest PARTIAL rows with no error
        require(s != FreeSect, s"sector chain hits a free sector (truncated file?) in $path")
        require(s >= 0 && s < table.length, s"corrupt sector chain in $path")
        out += s; s = table(s)
        guard += 1; require(guard <= table.length, s"cyclic sector chain in $path")
      }
      out.toSeq
    }
    // directory entries: 128 bytes each
    val dirBytes = chain(firstDir, fat).toArray.flatMap(sector)
    case class Entry(name: String, objType: Int, start: Int, size: Long)
    val entries = (0 until dirBytes.length / 128).map { i =>
      val o = i * 128
      val nameLen = u16(dirBytes, o + 64) // bytes incl. terminator
      val name = if (nameLen >= 2)
        new String(dirBytes, o, nameLen - 2, "UTF-16LE") else ""
      Entry(name, dirBytes(o + 66) & 0xff, i32(dirBytes, o + 116),
        i32(dirBytes, o + 120).toLong & 0xFFFFFFFFL)
    }
    val root = entries.find(_.objType == 5).getOrElse(
      throw new IllegalArgumentException(s"no CFB root entry in $path"))
    val target = entries.find(e => e.objType == 2 && names.contains(e.name))
      .getOrElse(throw new IllegalArgumentException(
        s"no Workbook stream in $path (streams: ${
          entries.filter(_.objType == 2).map(_.name).mkString(", ")})"))
    require(target.size <= Int.MaxValue,
      s"stream size ${target.size} exceeds 2 GiB in $path")
    val size = target.size.toInt
    def sized(raw: Array[Byte]): Array[Byte] = {
      require(raw.length >= size,
        s"stream shorter than its directory size (${raw.length} < $size) in $path")
      java.util.Arrays.copyOf(raw, size)
    }
    if (size >= miniCutoff) {
      sized(chain(target.start, fat).toArray.flatMap(sector))
    } else {
      // mini-stream: the root entry's chain holds the backing bytes;
      // the mini-FAT chains 64-byte sectors within it
      val miniStream = chain(root.start, fat).toArray.flatMap(sector)
      val miniFat: Array[Int] = chain(firstMiniFat, fat).toArray.flatMap { fs =>
        val sb = sector(fs); (0 until intsPerSector).map(i => i32(sb, 4 * i))
      }
      sized(chain(target.start, miniFat).toArray.flatMap { ms =>
        java.util.Arrays.copyOfRange(miniStream, ms * miniSize,
          math.min((ms + 1) * miniSize, miniStream.length))
      })
    }
  }

  // ---- BIFF8 records -----------------------------------------------------

  private case class Rec(typ: Int, off: Int, len: Int)

  private def records(s: Array[Byte], from: Int): Iterator[Rec] =
    new Iterator[Rec] {
      private var o = from
      def hasNext: Boolean = o + 4 <= s.length
      def next(): Rec = {
        val r = Rec(u16(s, o), o + 4, u16(s, o + 2))
        require(r.off + r.len <= s.length, "truncated BIFF record")
        o = r.off + r.len; r
      }
    }

  /** Cursor over an SST payload plus its Continue records: fixed-width
    * fields never split across records (writers guarantee it), but
    * string CHARACTER data may — and each continuation restarts with a
    * fresh flags byte. */
  private final class SstCursor(segs: IndexedSeq[(Int, Int)], s: Array[Byte], path: String) {
    private var seg = 0
    private var off = segs.head._1
    private def segEnd = segs(seg)._2
    private def advanceIfDone(): Unit =
      while (off >= segEnd && seg < segs.length - 1) { seg += 1; off = segs(seg)._1 }
    def u8(): Int = {
      advanceIfDone()
      require(off < segEnd, s"SST runs past its records in $path")
      val v = s(off) & 0xff; off += 1; v
    }
    def u16v(): Int = { val a = u8(); a | (u8() << 8) }
    def u32v(): Long = { u16v().toLong | (u16v().toLong << 16) }
    def skip(n: Long): Unit = {
      var left = n
      while (left > 0) {
        advanceIfDone()
        val take = math.min(left, (segEnd - off).toLong)
        require(take > 0, s"SST runs past its records in $path")
        off += take.toInt; left -= take
      }
    }
    /** One XLUnicodeRichExtendedString at the cursor. */
    def string(): String = {
      val cch = u16v()
      var flags = u8()
      val cRun = if ((flags & 0x08) != 0) u16v() else 0
      val cbExt = if ((flags & 0x04) != 0) u32v() else 0L
      val sb = new StringBuilder
      var read = 0
      var charSeg = seg
      while (read < cch) {
        advanceIfDone()
        if (off >= segEnd)
          throw new IllegalArgumentException(s"SST string runs past its records in $path")
        // at a continuation boundary the encoding flag restarts —
        // detected by SEGMENT change, so a split right after the
        // header's flags byte is handled too
        if (seg != charSeg) { charSeg = seg; flags = u8() }
        if ((flags & 0x01) == 0) sb.append((s(off) & 0xff).toChar)
        else {
          // a UTF-16 code unit is 2 bytes — a segment (or the file)
          // ending mid-code-unit is a malformed write, not a boundary
          if (off + 1 >= segEnd)
            throw new IllegalArgumentException(s"SST string runs past its records in $path")
          sb.append(u16(s, off).toChar); off += 1
        }
        off += 1
        read += 1
      }
      skip(cRun * 4L + cbExt)
      sb.toString
    }
  }

  private def rkValue(rk: Int): Double = {
    val base =
      if ((rk & 0x2) != 0) (rk >> 2).toDouble // signed 30-bit int
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if ((rk & 0x1) != 0) base / 100.0 else base
  }

  /** Render a numeric cell the way the XLSX path sees it in <v>. */
  private def num(d: Double): String =
    if (d == scala.math.rint(d) && math.abs(d) <= 1e15) d.toLong.toString
    else d.toString

  /** Parse the workbook stream → sparse (colIdx, value) rows. */
  private def parseWorkbook(s: Array[Byte], path: String): Seq[Seq[(Int, String)]] = {
    val globals = records(s, 0)
    val first = globals.next()
    require(first.typ == 0x0809 && u16(s, first.off) == 0x0600,
      s"not a BIFF8 workbook (BIFF5/95 and earlier are unsupported): $path")
    val sst = ArrayBuffer.empty[String]
    var sheetPos = -1
    var done = false
    while (globals.hasNext && !done) {
      val r = globals.next()
      r.typ match {
        case 0x00FC => // SST + its Continue records
          val segs = ArrayBuffer((r.off, r.off + r.len))
          val peek = records(s, r.off + r.len)
          var scanning = true
          while (scanning && peek.hasNext) {
            val n = peek.next()
            if (n.typ == 0x003C) segs += ((n.off, n.off + n.len)) else scanning = false
          }
          val cur = new SstCursor(segs.toIndexedSeq, s, path)
          cur.skip(8) // cstTotal, cstUnique
          val unique = i32(s, r.off + 4)
          (0 until unique).foreach(_ => sst += cur.string())
        case 0x0085 => // BOUNDSHEET: first WORKSHEET substream (dt byte
          // 0x00; chart/VB-module sheets are skipped like the xlsx
          // path only reads xl/worksheets/)
          require(r.len >= 6, s"truncated BOUNDSHEET in $path")
          if (sheetPos < 0 && (s(r.off + 5) & 0xff) == 0x00)
            sheetPos = i32(s, r.off)
        case 0x002F =>
          throw new IllegalArgumentException(
            s"encrypted .xls is not supported: $path")
        case 0x000A => done = true
        case _ =>
      }
    }
    require(sheetPos >= 0, s"no worksheet in $path")

    val byRow = scala.collection.mutable.SortedMap.empty[Int, ListBuffer[(Int, String)]]
    def put(row: Int, c: Int, v: String): Unit =
      byRow.getOrElseUpdate(row, ListBuffer.empty) += ((c, v))
    val sheet = records(s, sheetPos)
    val sheetBof = sheet.next()
    require(sheetBof.typ == 0x0809, s"bad worksheet offset in $path")
    var sheetDone = false
    // every field read stays inside the record's declared length — a
    // lying length (e.g. a LABEL whose cch exceeds its payload) must
    // fail loudly, never read into the following records
    def bounded(r: Rec, need: Int): Unit =
      require(need <= r.len,
        s"cell record 0x${r.typ.toHexString} claims $need bytes but has ${r.len} in $path")
    while (sheet.hasNext && !sheetDone) {
      val r = sheet.next()
      r.typ match {
        case 0x0208 => // ROW: materializes the row even if every cell
          // is blank (Excel always emits these; an all-empty row must
          // survive like the xlsx path's cell-less <row> element)
          bounded(r, 2)
          byRow.getOrElseUpdate(u16(s, r.off), ListBuffer.empty); ()
        case 0x00FD => // LABELSST
          bounded(r, 10)
          val i = i32(s, r.off + 6)
          require(i >= 0 && i < sst.length, s"SST index $i out of range in $path")
          put(u16(s, r.off), u16(s, r.off + 2), sst(i))
        case 0x0203 => // NUMBER (IEEE double)
          bounded(r, 14)
          val bits = (0 until 8).map(i => (s(r.off + 6 + i).toLong & 0xff) << (8 * i)).sum
          put(u16(s, r.off), u16(s, r.off + 2),
            num(java.lang.Double.longBitsToDouble(bits)))
        case 0x027E => // RK
          bounded(r, 10)
          put(u16(s, r.off), u16(s, r.off + 2), num(rkValue(i32(s, r.off + 6))))
        case 0x00BD => // MULRK
          bounded(r, 12) // at least one rkrec
          val row = u16(s, r.off)
          val colFirst = u16(s, r.off + 2)
          val n = (r.len - 6) / 6
          (0 until n).foreach { i =>
            put(row, colFirst + i, num(rkValue(i32(s, r.off + 4 + 6 * i + 2))))
          }
        case 0x0204 => // LABEL (inline BIFF8 XLUnicodeRichExtendedString)
          bounded(r, 9)
          val cch = u16(s, r.off + 6)
          val flags = s(r.off + 8) & 0xff
          // rich-run count / ext length precede the characters
          var o = r.off + 9
          if ((flags & 0x08) != 0) o += 2
          if ((flags & 0x04) != 0) o += 4
          val nBytes = if ((flags & 0x01) == 0) cch else cch * 2
          bounded(r, (o - r.off) + nBytes)
          val v =
            if ((flags & 0x01) == 0) new String(s, o, cch, "ISO-8859-1")
            else new String(s, o, nBytes, "UTF-16LE")
          put(u16(s, r.off), u16(s, r.off + 2), v)
        case 0x0205 => // BOOLERR
          bounded(r, 8)
          val row = u16(s, r.off); val c = u16(s, r.off + 2)
          if ((s(r.off + 7) & 0xff) != 0)
            throw new IllegalArgumentException(
              s"error cell at row ${row + 1}, col ${c + 1} in $path — fix or re-export")
          put(row, c, if ((s(r.off + 6) & 0xff) != 0) "true" else "false")
        case 0x0006 =>
          throw new IllegalArgumentException(
            s"formula cells are not supported in .xls uploads ($path) — " +
              "paste as values or re-export as .xlsx (whose cached values are read)")
        case 0x000A => sheetDone = true
        case _ =>
      }
    }
    byRow.values.map(_.toSeq).toSeq
  }

  /** Read a legacy .xls file into a typed DataFrame (same header and
    * type-inference semantics as [[XlsxReader.read]]). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val wb = cfbStream(bytes, Set("Workbook", "Book"), path)
    XlsxReader.sheetToDataFrame(spark, parseWorkbook(wb, path), path)
  }
}
