package graft

import graft.storage.{BiffBytes, XlsReader}

/** Round-8 hardening regressions: the advisor's XLS/XLSX edge cases. */
class Round8ReviewSpec extends SparkTestBase {

  private def write(bytes: Array[Byte], name: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-r8")
    val p = d.resolve(name)
    java.nio.file.Files.write(p, bytes)
    p.toString
  }

  test("header literally named col_N next to an empty header cell N still dedups") {
    import BiffBytes._
    // header: cell0 = "col_2", cell1 = "a", cell2 EMPTY (fallback col_2)
    // data:   three populated cells so width covers index 2
    val sheet =
      label(0, 0, "col_2") ++ label(0, 1, "a") ++
        label(1, 0, "x") ++ label(1, 1, "y") ++ label(1, 2, "z")
    val p = write(cfbMini(workbook(Array.empty[Byte], sheet)), "clash.xls")
    val df = XlsReader.read(spark, p)
    val names = df.schema.fieldNames.toSeq
    assert(names.distinct.length === names.length, s"duplicate columns: $names")
    assert(names.contains("a"))
    // both col_2 claimants carry a positional suffix — unambiguous SQL
    assert(names.count(_.startsWith("col_2")) === 2, names.toString)
  }

  test("SST whose UTF-16 data ends mid-code-unit fails loudly, not AIOOBE") {
    import BiffBytes._
    // one UTF-16 string of 2 chars but only 3 payload bytes after the
    // header — the last code unit is split by the end of the record
    val sstPayload =
      u32(1) ++ u32(1) ++ // cstTotal, cstUnique
        u16(2) ++ Array(1.toByte) ++ "ab".getBytes("UTF-16LE").dropRight(1)
    val globals = rec(0x00FC, sstPayload) // workbook() adds the boundsheet
    val sheet = labelSst(0, 0, 0)
    val e = intercept[IllegalArgumentException] {
      XlsReader.read(spark, write(cfbMini(workbook(globals, sheet)), "splitu16.xls"))
    }
    assert(e.getMessage.contains("SST"), e.getMessage)
  }

  test("hostile CFB sector ids outside the file fail with a path-tagged message") {
    import BiffBytes._
    val ok = cfbMini(workbook(Array.empty[Byte], label(0, 0, "x")))
    // corrupt: point a header-DIFAT FAT sector id far outside the file
    ok(76) = 0x40.toByte; ok(77) = 0x42.toByte; ok(78) = 0x0F.toByte; ok(79) = 0
    val p = write(ok, "hostile.xls")
    val e = intercept[IllegalArgumentException] { XlsReader.read(spark, p) }
    assert(e.getMessage.contains("hostile.xls"), e.getMessage)
  }
}
