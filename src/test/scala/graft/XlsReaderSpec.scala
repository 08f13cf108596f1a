package graft

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.storage.{FileStaging, XlsReader}

/** BIFF8 reader against hand-assembled CFB containers: the writer here
  * follows MS-CFB/MS-XLS byte layouts independently of the reader, so
  * agreement pins both sides. Covers the regular-FAT and mini-stream
  * container layouts, every supported cell record (NUMBER, all three
  * RK encodings, MULRK, LABELSST, LABEL, BOOLERR), an SST whose
  * character data splits across a Continue record AND switches
  * encoding at the boundary, and the loud failure modes (BIFF5,
  * formula cells, error cells, non-CFB bytes). */
class XlsReaderSpec extends SparkTestBase {

  // ---- little-endian byte builders ---------------------------------------

  private def u16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def u32(v: Long): Array[Byte] =
    Array.tabulate(4)(i => ((v >> (8 * i)) & 0xff).toByte)
  private def f64(d: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(d)
    Array.tabulate(8)(i => ((bits >> (8 * i)) & 0xff).toByte)
  }
  private def rec(typ: Int, payload: Array[Byte]): Array[Byte] =
    u16(typ) ++ u16(payload.length) ++ payload

  // ---- BIFF8 records -----------------------------------------------------

  private def bof(dt: Int): Array[Byte] =
    rec(0x0809, u16(0x0600) ++ u16(dt) ++ Array.fill[Byte](12)(0))
  private val eof = rec(0x000A, Array.empty[Byte])

  private def sstString(s: String, utf16: Boolean): Array[Byte] =
    u16(s.length) ++ Array((if (utf16) 1 else 0).toByte) ++
      (if (utf16) s.getBytes("UTF-16LE") else s.getBytes("ISO-8859-1"))

  private def cell6(row: Int, col: Int): Array[Byte] =
    u16(row) ++ u16(col) ++ u16(0) // row, col, ixfe

  private def labelSst(row: Int, col: Int, isst: Int): Array[Byte] =
    rec(0x00FD, cell6(row, col) ++ u32(isst))
  private def number(row: Int, col: Int, d: Double): Array[Byte] =
    rec(0x0203, cell6(row, col) ++ f64(d))
  private def rkInt(v: Int): Long = ((v.toLong << 2) & 0xFFFFFFFFL) | 0x2L
  private def rkIntX100(v100: Int): Long = ((v100.toLong << 2) & 0xFFFFFFFFL) | 0x3L
  private def rkFloat(d: Double): Long =
    (java.lang.Double.doubleToLongBits(d) >>> 32) & 0xFFFFFFFCL
  private def rk(row: Int, col: Int, rkv: Long): Array[Byte] =
    rec(0x027E, cell6(row, col) ++ u32(rkv))
  private def mulRk(row: Int, colFirst: Int, rks: Seq[Long]): Array[Byte] =
    rec(0x00BD, u16(row) ++ u16(colFirst) ++
      rks.toArray.flatMap(r => u16(0) ++ u32(r)) ++
      u16(colFirst + rks.size - 1))
  private def label(row: Int, col: Int, s: String): Array[Byte] =
    rec(0x0204, cell6(row, col) ++ u16(s.length) ++ Array(0.toByte) ++
      s.getBytes("ISO-8859-1"))
  private def boolErr(row: Int, col: Int, b: Boolean): Array[Byte] =
    rec(0x0205, cell6(row, col) ++
      Array((if (b) 1 else 0).toByte, 0.toByte))

  private def boundsheet(pos: Int, name: String): Array[Byte] =
    rec(0x0085, u32(pos) ++ u16(0) ++
      Array(name.length.toByte, 0.toByte) ++ name.getBytes("ISO-8859-1"))

  /** Globals + one sheet; boundsheet offset patched after layout. */
  private def workbook(globalsMid: Array[Byte], sheetCells: Array[Byte]): Array[Byte] = {
    val sheet = bof(0x0010) ++ sheetCells ++ eof
    def globals(pos: Int) =
      bof(0x0005) ++ globalsMid ++ boundsheet(pos, "Sheet1") ++ eof
    val pos = globals(0).length
    globals(pos) ++ sheet
  }

  // ---- CFB containers ----------------------------------------------------

  private val EOC = 0xFFFFFFFEL
  private val FREE = 0xFFFFFFFFL
  private val FATSECT = 0xFFFFFFFDL

  private def header(numFat: Int, firstDir: Int, firstMiniFat: Long,
      numMiniFat: Int, difat0: Long): Array[Byte] = {
    val h = new ByteArrayOutputStream()
    h.write(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    h.write(Array.fill[Byte](16)(0)) // clsid
    h.write(u16(0x003E)); h.write(u16(0x0003)) // minor, major
    h.write(u16(0xFFFE)) // little-endian
    h.write(u16(9)); h.write(u16(6)) // sector 512, mini 64
    h.write(Array.fill[Byte](6)(0))
    h.write(u32(0)) // numDirSectors (v3: 0)
    h.write(u32(numFat))
    h.write(u32(firstDir))
    h.write(u32(0)) // transaction
    h.write(u32(4096)) // mini cutoff
    h.write(u32(firstMiniFat)); h.write(u32(numMiniFat))
    h.write(u32(EOC)); h.write(u32(0)) // first DIFAT, numDifat
    h.write(u32(difat0))
    (1 until 109).foreach(_ => h.write(u32(FREE)))
    h.toByteArray // 512 bytes
  }

  private def dirEntry(name: String, objType: Int, start: Long, size: Long): Array[Byte] = {
    val e = new ByteArrayOutputStream()
    val nm = name.getBytes("UTF-16LE")
    e.write(nm); e.write(Array.fill[Byte](64 - nm.length)(0))
    e.write(u16(nm.length + 2))
    e.write(Array(objType.toByte, 1.toByte)) // type, black
    e.write(u32(FREE)); e.write(u32(FREE)) // siblings
    e.write(if (objType == 5) u32(1) else u32(FREE)) // child
    e.write(Array.fill[Byte](36)(0)) // clsid, state, times
    e.write(u32(start))
    e.write(u32(size)); e.write(u32(0))
    e.toByteArray // 128 bytes
  }

  private def pad(b: Array[Byte], unit: Int): Array[Byte] =
    java.util.Arrays.copyOf(b, ((b.length + unit - 1) / unit) * unit)

  private def fatSector(entries: Seq[Long]): Array[Byte] =
    (entries ++ Seq.fill(128 - entries.size)(FREE)).toArray.flatMap(u32)

  /** Regular-FAT layout: sector 0 = FAT, 1 = directory, 2.. = stream. */
  private def cfbRegular(wb: Array[Byte]): Array[Byte] = {
    val data = pad(wb, 512)
    val n = data.length / 512
    val fat = Seq[Long](FATSECT, EOC) ++
      (0 until n).map(i => if (i == n - 1) EOC else (3 + i).toLong)
    val dir = pad(dirEntry("Root Entry", 5, EOC, 0) ++
      dirEntry("Workbook", 2, 2, wb.length), 512)
    header(1, 1, EOC, 0, 0) ++ fatSector(fat) ++ dir ++ data
  }

  /** Mini-stream layout: 0 = FAT, 1 = dir, 2 = miniFAT, 3.. = ministream. */
  private def cfbMini(wb: Array[Byte]): Array[Byte] = {
    require(wb.length < 4096)
    val mini = pad(wb, 64)
    val nMini = mini.length / 64
    val miniData = pad(mini, 512)
    val nStream = miniData.length / 512
    val fat = Seq[Long](FATSECT, EOC, EOC) ++
      (0 until nStream).map(i => if (i == nStream - 1) EOC else (4 + i).toLong)
    val miniFat = (0 until nMini).map(i => if (i == nMini - 1) EOC else (i + 1).toLong)
    val dir = pad(dirEntry("Root Entry", 5, 3, mini.length) ++
      dirEntry("Workbook", 2, 0, wb.length), 512)
    header(1, 1, 2, 1, 0) ++ fatSector(fat) ++ dir ++
      fatSector(miniFat) ++ miniData
  }

  private def write(bytes: Array[Byte], name: String): String = {
    val dir = Files.createTempDirectory("graft-xls")
    val p = dir.resolve(name)
    Files.write(p, bytes)
    p.toString
  }

  // ---- tests -------------------------------------------------------------

  private def standardSheet: Array[Byte] =
    // header row via LABEL + LABELSST
    label(0, 0, "name") ++ labelSst(0, 1, 0) ++ label(0, 2, "score") ++
      label(0, 3, "flag") ++
      // data: every numeric encoding + strings + bool
      labelSst(1, 0, 1) ++ number(1, 1, 7) ++ rk(1, 2, rkFloat(2.5)) ++
      boolErr(1, 3, true) ++
      label(2, 0, "beta") ++ rk(2, 1, rkInt(1234)) ++
      rk(2, 2, rkIntX100(1250)) ++ boolErr(2, 3, false) ++
      mulRk(3, 0, Seq(rkInt(9), rkInt(10), rkIntX100(-325)))

  private def standardGlobals: Array[Byte] =
    rec(0x00FC, u32(2) ++ u32(2) ++
      sstString("amount", utf16 = false) ++ sstString("ålpha", utf16 = true))

  private def assertStandard(path: String): Unit = {
    val df = XlsReader.read(spark, path)
    assert(df.columns.toSeq === Seq("name", "amount", "score", "flag"))
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("amount") === "bigint") // 7, 1234, 9
    assert(types("score") === "double") // 2.5, 12.5, -3.25
    assert(types("flag") === "string")
    val rows = df.orderBy(col("name")).collect()
    assert(rows.length === 3)
    assert(rows(0).getString(0) === "9" && rows(0).getLong(1) === 10L &&
      rows(0).getDouble(2) === -3.25) // MULRK row (name col holds rkInt 9)
    assert(rows(1).getString(0) === "beta" && rows(1).getLong(1) === 1234L &&
      rows(1).getDouble(2) === 12.5 && rows(1).getString(3) === "false")
    assert(rows(2).getString(0) === "ålpha" && rows(2).getLong(1) === 7L &&
      rows(2).getDouble(2) === 2.5 && rows(2).getString(3) === "true")
  }

  test("regular-FAT container: all cell records, RK encodings, unicode SST") {
    // CFB puts streams under 4096 bytes in the mini-stream, so the
    // regular path needs the workbook padded past the cutoff (the
    // trailing zeros sit beyond the sheet's EOF record, never visited)
    val wb = workbook(standardGlobals, standardSheet)
    val padded = java.util.Arrays.copyOf(wb, math.max(wb.length, 4096))
    assertStandard(write(cfbRegular(padded), "reg.xls"))
  }

  test("mini-stream container: same workbook under the 4096-byte cutoff") {
    val wb = workbook(standardGlobals, standardSheet)
    assert(wb.length < 4096) // must actually exercise the mini path
    assertStandard(write(cfbMini(wb), "mini.xls"))
  }

  test("SST string split across a Continue record with an encoding switch") {
    // "hello" compressed in the SST record; "_wörld" UTF-16 in Continue
    val part1 = u32(1) ++ u32(1) ++ u16(11) ++ Array(0.toByte) ++
      "hello".getBytes("ISO-8859-1")
    val part2 = Array(1.toByte) ++ "_wörld".getBytes("UTF-16LE")
    val globals = rec(0x00FC, part1) ++ rec(0x003C, part2)
    val sheet = label(0, 0, "h") ++ labelSst(1, 0, 0)
    val p = write(cfbMini(workbook(globals, sheet)), "cont.xls")
    val df = XlsReader.read(spark, p)
    assert(df.collect()(0).getString(0) === "hello_wörld")
  }

  test("staging path reads .xls and large workbooks take the regular-FAT path") {
    // >4096 bytes of NUMBER records forces the regular-FAT branch
    val many = (1 to 400).map(i => number(i, 0, i.toDouble))
      .foldLeft(label(0, 0, "v"))(_ ++ _)
    val wb = workbook(Array.empty[Byte], many)
    assert(wb.length >= 4096)
    val p = write(cfbRegular(wb), "big.xls")
    val df = FileStaging.stage(spark, p, "staged_xls")
    assert(df.count() === 400)
    assert(spark.sql("SELECT sum(v) AS s FROM staged_xls")
      .collect()(0).getLong(0) === (1 to 400).sum.toLong)
  }

  test("loud failures: BIFF5, formula cells, error cells") {
    val biff5 = cfbMini(
      rec(0x0809, u16(0x0500) ++ u16(0x0005) ++ Array.fill[Byte](12)(0)) ++ eof)
    val e1 = intercept[IllegalArgumentException] {
      XlsReader.read(spark, write(biff5, "biff5.xls")) }
    assert(e1.getMessage.contains("BIFF8"))
    val withFormula = workbook(Array.empty[Byte],
      label(0, 0, "x") ++ rec(0x0006, cell6(1, 0) ++ Array.fill[Byte](16)(0)))
    val e2 = intercept[IllegalArgumentException] {
      XlsReader.read(spark, write(cfbMini(withFormula), "formula.xls")) }
    assert(e2.getMessage.contains("formula"))
    val withErr = workbook(Array.empty[Byte],
      label(0, 0, "x") ++ rec(0x0205, cell6(1, 0) ++ Array(0x07.toByte, 1.toByte)))
    val e3 = intercept[IllegalArgumentException] {
      XlsReader.read(spark, write(cfbMini(withErr), "err.xls")) }
    assert(e3.getMessage.contains("error cell"))
  }
}
