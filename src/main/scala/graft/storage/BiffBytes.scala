package graft.storage

/** BIFF8 + CFB byte BUILDERS (MS-XLS / MS-CFB layouts) — the single
  * writer shared by the st07 upload gate and XlsReaderSpec, so the two
  * consumers can't drift apart on the byte layout while remaining
  * independent of [[XlsReader]]'s parsing code. Writing only; scope is
  * what the gate/spec need (one sheet, LABEL/NUMBER/RK/MULRK/
  * LABELSST/BOOLERR cells, SST, both container layouts). */
private[graft] object BiffBytes {

  def u16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  def u32(v: Long): Array[Byte] =
    Array.tabulate(4)(i => ((v >> (8 * i)) & 0xff).toByte)
  def f64(d: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(d)
    Array.tabulate(8)(i => ((bits >> (8 * i)) & 0xff).toByte)
  }
  def rec(typ: Int, p: Array[Byte]): Array[Byte] = u16(typ) ++ u16(p.length) ++ p

  // ---- records -----------------------------------------------------------

  def bof(dt: Int): Array[Byte] =
    rec(0x0809, u16(0x0600) ++ u16(dt) ++ Array.fill[Byte](12)(0))
  val eof: Array[Byte] = rec(0x000A, Array.empty[Byte])

  private def cell6(row: Int, colIdx: Int): Array[Byte] =
    u16(row) ++ u16(colIdx) ++ u16(0) // row, col, ixfe

  /** ROW record — materializes a row with no (or all-blank) cells,
    * as real Excel writers always do. */
  def rowRec(row: Int): Array[Byte] =
    rec(0x0208, u16(row) ++ u16(0) ++ u16(0) ++ u16(0) ++
      Array.fill[Byte](8)(0))

  def label(row: Int, colIdx: Int, s: String): Array[Byte] =
    rec(0x0204, cell6(row, colIdx) ++ u16(s.length) ++ Array(0.toByte) ++
      s.getBytes("ISO-8859-1"))
  def number(row: Int, colIdx: Int, d: Double): Array[Byte] =
    rec(0x0203, cell6(row, colIdx) ++ f64(d))
  def labelSst(row: Int, colIdx: Int, isst: Int): Array[Byte] =
    rec(0x00FD, cell6(row, colIdx) ++ u32(isst))
  def rk(row: Int, colIdx: Int, rkv: Long): Array[Byte] =
    rec(0x027E, cell6(row, colIdx) ++ u32(rkv))
  def mulRk(row: Int, colFirst: Int, rks: Seq[Long]): Array[Byte] =
    rec(0x00BD, u16(row) ++ u16(colFirst) ++
      rks.toArray.flatMap(r => u16(0) ++ u32(r)) ++
      u16(colFirst + rks.size - 1))
  def boolErr(row: Int, colIdx: Int, b: Boolean): Array[Byte] =
    rec(0x0205, cell6(row, colIdx) ++ Array((if (b) 1 else 0).toByte, 0.toByte))

  def rkInt(v: Int): Long = ((v.toLong << 2) & 0xFFFFFFFFL) | 0x2L
  def rkIntX100(v100: Int): Long = ((v100.toLong << 2) & 0xFFFFFFFFL) | 0x3L
  def rkFloat(d: Double): Long =
    (java.lang.Double.doubleToLongBits(d) >>> 32) & 0xFFFFFFFCL

  def sstString(s: String, utf16: Boolean): Array[Byte] =
    u16(s.length) ++ Array((if (utf16) 1 else 0).toByte) ++
      (if (utf16) s.getBytes("UTF-16LE") else s.getBytes("ISO-8859-1"))

  def boundsheet(pos: Int, name: String): Array[Byte] =
    rec(0x0085, u32(pos) ++ u16(0) ++ // hsState 0 (visible), dt 0 (worksheet)
      Array(name.length.toByte, 0.toByte) ++ name.getBytes("ISO-8859-1"))

  /** Globals (+ optional mid records, e.g. an SST) + one worksheet;
    * the boundsheet offset is laid out then patched. */
  def workbook(globalsMid: Array[Byte], sheetCells: Array[Byte]): Array[Byte] = {
    val sheet = bof(0x0010) ++ sheetCells ++ eof
    def globals(pos: Int) =
      bof(0x0005) ++ globalsMid ++ boundsheet(pos, "Sheet1") ++ eof
    globals(globals(0).length) ++ sheet
  }

  // ---- CFB containers ----------------------------------------------------

  private val EOC = 0xFFFFFFFEL
  private val FREE = 0xFFFFFFFFL
  private val FATSECT = 0xFFFFFFFDL

  def pad(b: Array[Byte], unit: Int): Array[Byte] =
    java.util.Arrays.copyOf(b, ((b.length + unit - 1) / unit) * unit)

  private def fatSector(es: Seq[Long]): Array[Byte] =
    (es ++ Seq.fill(128 - es.size)(FREE)).toArray.flatMap(u32)

  private def dirEntry(name: String, objType: Int, start: Long, size: Long): Array[Byte] = {
    val nm = name.getBytes("UTF-16LE")
    nm ++ Array.fill[Byte](64 - nm.length)(0) ++ u16(nm.length + 2) ++
      Array(objType.toByte, 1.toByte) ++ u32(FREE) ++ u32(FREE) ++
      (if (objType == 5) u32(1) else u32(FREE)) ++
      Array.fill[Byte](36)(0) ++ u32(start) ++ u32(size) ++ u32(0)
  }

  private def header(numFat: Int, firstDir: Int, firstMiniFat: Long,
      numMiniFat: Int): Array[Byte] =
    Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte) ++
      Array.fill[Byte](16)(0) ++ u16(0x003E) ++ u16(3) ++ u16(0xFFFE) ++
      u16(9) ++ u16(6) ++ Array.fill[Byte](6)(0) ++ u32(0) ++ u32(numFat) ++
      u32(firstDir) ++ u32(0) ++ u32(4096) ++ u32(firstMiniFat) ++
      u32(numMiniFat) ++ u32(EOC) ++ u32(0) ++ u32(0) ++
      (1 until 109).toArray.flatMap(_ => u32(FREE))

  /** Regular-FAT layout (stream must be ≥ the 4096-byte mini cutoff):
    * sector 0 = FAT, 1 = directory, 2.. = stream. */
  def cfbRegular(wb: Array[Byte]): Array[Byte] = {
    require(wb.length >= 4096,
      "streams under the mini cutoff belong in the mini-stream (cfbMini)")
    val data = pad(wb, 512)
    val n = data.length / 512
    val fat = Seq[Long](FATSECT, EOC) ++
      (0 until n).map(i => if (i == n - 1) EOC else (3 + i).toLong)
    val dir = pad(dirEntry("Root Entry", 5, EOC, 0) ++
      dirEntry("Workbook", 2, 2, wb.length), 512)
    header(1, 1, EOC, 0) ++ fatSector(fat) ++ dir ++ data
  }

  /** Mini-stream layout (stream under the cutoff): 0 = FAT, 1 = dir,
    * 2 = mini-FAT, 3.. = mini-stream backing sectors. */
  def cfbMini(wb: Array[Byte]): Array[Byte] = {
    require(wb.length < 4096, "use cfbRegular at or above the mini cutoff")
    val mini = pad(wb, 64)
    val nMini = mini.length / 64
    val miniData = pad(mini, 512)
    val nStream = miniData.length / 512
    val fat = Seq[Long](FATSECT, EOC, EOC) ++
      (0 until nStream).map(i => if (i == nStream - 1) EOC else (4 + i).toLong)
    val miniFat = (0 until nMini).map(i => if (i == nMini - 1) EOC else (i + 1).toLong)
    val dir = pad(dirEntry("Root Entry", 5, 3, mini.length) ++
      dirEntry("Workbook", 2, 0, wb.length), 512)
    header(1, 1, 2, 1) ++ fatSector(fat) ++ dir ++ fatSector(miniFat) ++ miniData
  }
}
