package graft

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.storage.{BiffBytes, FileStaging, XlsReader}
import graft.storage.BiffBytes._

/** BIFF8 reader against hand-assembled CFB containers: the writer here
  * follows MS-CFB/MS-XLS byte layouts independently of the reader, so
  * agreement pins both sides. Covers the regular-FAT and mini-stream
  * container layouts, every supported cell record (NUMBER, all three
  * RK encodings, MULRK, LABELSST, LABEL, BOOLERR), an SST whose
  * character data splits across a Continue record AND switches
  * encoding at the boundary, and the loud failure modes (BIFF5,
  * formula cells, error cells, non-CFB bytes). */
class XlsReaderSpec extends SparkTestBase {

  private def write(bytes: Array[Byte], name: String): String = {
    val dir = Files.createTempDirectory("graft-xls")
    val p = dir.resolve(name)
    Files.write(p, bytes)
    p.toString
  }

  private def cell6(row: Int, colIdx: Int): Array[Byte] =
    u16(row) ++ u16(colIdx) ++ u16(0)

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

  test("SST split exactly after a string header re-reads the continuation flags") {
    // review-confirmed bug shape: the SST record ends right after
    // cch+flags; every character lives in the Continue, whose leading
    // flags byte must NOT be consumed as the first character
    val part1 = u32(1) ++ u32(1) ++ u16(5) ++ Array(0.toByte)
    val part2 = Array(0.toByte) ++ "hello".getBytes("ISO-8859-1")
    val globals = rec(0x00FC, part1) ++ rec(0x003C, part2)
    val sheet = label(0, 0, "h") ++ labelSst(1, 0, 0)
    val p = write(cfbMini(workbook(globals, sheet)), "cont2.xls")
    assert(XlsReader.read(spark, p).collect()(0).getString(0) === "hello")
  }

  test("lying record lengths and truncated streams fail loudly") {
    // LABEL claiming 1000 chars in a short record must not read into
    // the following records
    val lying = rec(0x0204, u16(1) ++ u16(0) ++ u16(0) ++ u16(1000) ++
      Array(0.toByte) ++ "ab".getBytes("ISO-8859-1"))
    val wb = workbook(Array.empty[Byte], label(0, 0, "x") ++ lying)
    val e = intercept[IllegalArgumentException] {
      XlsReader.read(spark, write(cfbMini(wb), "lying.xls")) }
    assert(e.getMessage.contains("claims"))
    // a FREESECT mid-chain (truncated container) is rejected, not
    // silently zero-padded into partial rows
    val ok = cfbMini(workbook(Array.empty[Byte], label(0, 0, "x")))
    // corrupt: point the workbook's first mini-FAT entry at FREESECT
    val corrupted = ok.clone()
    // miniFAT sector is sector 2 → file offset (2+1)*512; entry 0
    val o = 3 * 512
    corrupted(o) = 0xFF.toByte; corrupted(o + 1) = 0xFF.toByte
    corrupted(o + 2) = 0xFF.toByte; corrupted(o + 3) = 0xFF.toByte
    val e2 = intercept[IllegalArgumentException] {
      XlsReader.read(spark, write(corrupted, "trunc.xls")) }
    assert(e2.getMessage.contains("free sector") ||
      e2.getMessage.contains("shorter than"))
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
