package graft

import org.apache.spark.sql.types._

import graft.schema.{CustomSchemaJson, GraftType}
import graft.storage.{BiffBytes, GraphStore, XlsReader}

/** Round-8 hardening regressions: the advisor's XLS/XLSX edge cases
  * plus the composite property types (MAP/STRUCT/UNION) the custom
  * JSON schema path gained this round. */
class Round8ReviewSpec extends SparkTestBase {

  // ---- composite custom-schema types --------------------------------------

  test("composite types: parse -> Spark type -> DDL round-trips") {
    import GraftType._
    val cases = Seq(
      "MAP(STRING, INT64)" ->
        MapType(StringType, LongType),
      "STRUCT(a INT64, b STRING)" ->
        StructType(Seq(StructField("a", LongType), StructField("b", StringType))),
      "STRUCT(pt STRUCT(x DOUBLE, y DOUBLE), tags STRING[])" ->
        StructType(Seq(
          StructField("pt", StructType(Seq(
            StructField("x", DoubleType), StructField("y", DoubleType)))),
          StructField("tags", ArrayType(StringType)))),
      "MAP(STRING, LIST<INT64>)" ->
        MapType(StringType, ArrayType(LongType)),
      "UNION(i INT64, s STRING)" ->
        StructType(Seq(
          StructField("tag", StringType),
          StructField("i", LongType), StructField("s", StringType))),
      "INT64[]" -> ArrayType(LongType))
    cases.foreach { case (spelling, expected) =>
      val t = parse(spelling)
      assert(t.spark === expected, spelling)
      // the DDL emitter is parse's inverse
      assert(parse(ddlName(t)) === t, s"$spelling -> ${ddlName(t)}")
    }
  }

  test("composite types: NODE/REL and unparameterized composites rejected loudly") {
    Seq("NODE", "REL", "node").foreach { t =>
      val e = intercept[IllegalArgumentException](GraftType.parse(t))
      assert(e.getMessage.contains("table type"), s"$t: ${e.getMessage}")
    }
    Seq("LIST", "MAP", "STRUCT", "UNION").foreach { t =>
      val e = intercept[IllegalArgumentException](GraftType.parse(t))
      assert(e.getMessage.contains("parameters"), s"$t: ${e.getMessage}")
    }
    intercept[IllegalArgumentException](GraftType.parse("MAP(STRING)"))
    intercept[IllegalArgumentException](
      GraftType.parse("UNION(tag INT64, s STRING)"))
  }

  test("custom JSON schema with MAP/STRUCT properties stores and re-reads values") {
    import spark.implicits._
    val json =
      """{"name":"composite_demo","version":"1.0",
        "nodes":[
          {"name":"Sensor","properties":[
            {"name":"identifier","type":"STRING","is_primary_key":true},
            {"name":"readings","type":"MAP(STRING, DOUBLE)"},
            {"name":"loc","type":"STRUCT(lat DOUBLE, lon DOUBLE)"},
            {"name":"state","type":"UNION(code INT64, label STRING)"}]}],
        "relationships":[]}"""
    val schema = CustomSchemaJson.parse(json)
    val sensor = schema.node("Sensor")
    assert(sensor.structType("readings").dataType === MapType(StringType, DoubleType))
    assert(sensor.ddl().contains("loc STRUCT(lat DOUBLE, lon DOUBLE)"))
    assert(sensor.ddl().contains("state UNION(code INT64, label STRING)"))

    val root = java.nio.file.Files.createTempDirectory("graft-composite").toString
    val store = new GraphStore(spark, root, "composite", schema)
    store.ingestNodes("Sensor", Seq(
      ("s1", Map("temp" -> 21.5, "rh" -> 0.4), (52.5, 13.4), ("code", Some(7L), None: Option[String])),
      ("s2", Map("temp" -> 19.0), (48.9, 2.3), ("label", None: Option[Long], Some("ok"))))
      .toDF("identifier", "readings", "loc", "state")
      .withColumn("loc", org.apache.spark.sql.functions.expr(
        "named_struct('lat', loc._1, 'lon', loc._2)"))
      .withColumn("state", org.apache.spark.sql.functions.expr(
        "named_struct('tag', state._1, 'code', state._2, 'label', state._3)")))
    val back = store.node("Sensor")
      .selectExpr("identifier", "readings['temp']", "loc.lat", "state.tag", "state.code")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getString(3), if (r.isNullAt(4)) -1L else r.getLong(4))).sortBy(_._1)
    assert(back.toSeq === Seq(
      ("s1", 21.5, 52.5, "code", 7L), ("s2", 19.0, 48.9, "label", -1L)))
  }

  test("reference demo schema.json still parses after the composite-type extension") {
    val p = "/root/reference/examples/custom_graph_demo/schema.json"
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p)), "UTF-8")
    val schema = CustomSchemaJson.parse(json)
    assert(schema.nodes.nonEmpty && schema.rels.nonEmpty)
  }

  // ---- per-graph writer lock ----------------------------------------------

  private def nationSchema = CustomSchemaJson.parse(
    """{"name":"locked","version":"1.0",
      "nodes":[{"name":"Thing","properties":[
        {"name":"identifier","type":"STRING","is_primary_key":true},
        {"name":"v","type":"INT64"}]}],
      "relationships":[]}""")

  test("a foreign writer lock makes mutations fail loudly, and release unblocks them") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-lock").toString
    val store = new GraphStore(spark, root, "g1", nationSchema, lockWaitMs = 150L)
    // simulate another SESSION: hold the OS lock from a raw channel
    val lockPath = java.nio.file.Paths.get(s"$root/g1", ".writer.lock")
    java.nio.file.Files.createDirectories(lockPath.getParent)
    val ch = java.nio.channels.FileChannel.open(lockPath,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
    val fl = ch.lock()
    try {
      val e = intercept[IllegalStateException] {
        store.ingestNodes("Thing", Seq(("a", 1L)).toDF("identifier", "v"))
      }
      assert(e.getMessage.contains("single-writer"), e.getMessage)
    } finally { fl.release(); ch.close() }
    // released → the same mutation proceeds
    assert(store.ingestNodes("Thing",
      Seq(("a", 1L)).toDF("identifier", "v")) === 1L)
  }

  test("two concurrent in-JVM writers serialize: no lost update") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val root = java.nio.file.Files.createTempDirectory("graft-lock2").toString
    val store = new GraphStore(spark, root, "g2", nationSchema)
    val writes = (0 until 4).map { i =>
      Future {
        store.ingestNodes("Thing",
          Seq((s"k$i", i.toLong)).toDF("identifier", "v"),
          fileId = Some(s"w$i"))
      }
    }
    assert(Await.result(Future.sequence(writes), 120.seconds).sum === 4L)
    val stored = store.node("Thing").select("identifier").as[String]
      .collect().sorted
    assert(stored.toSeq === Seq("k0", "k1", "k2", "k3"))
  }

  // ---- snapshot generations -----------------------------------------------

  test("an open reader keeps its snapshot across a rewrite; retention vacuums older generations") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-gen").toString
    val store = new GraphStore(spark, root, "g3", nationSchema)
    store.ingestNodes("Thing", Seq(("a", 1L), ("b", 2L)).toDF("identifier", "v"))
    assert(store.generationOf("Thing") === 0)

    // reader opened BEFORE the rewrite — resolves the gen-0 files
    val snapshot = store.node("Thing").select("identifier", "v")

    def setV(id: String, v: Long): Unit = {
      store.updateNodeProps("Thing",
        Seq((id, v)).toDF("__key", "v")): Unit
    }
    setV("a", 10L) // -> _gen-1 (gen-0 root files retained: previous)
    assert(store.generationOf("Thing") === 1)
    // the old reader still scans its own snapshot's files
    assert(snapshot.collect().map(r => (r.getString(0), r.getLong(1))).sorted
      === Seq(("a", 1L), ("b", 2L)))
    // a fresh reader sees the new state
    assert(store.node("Thing").filter($"identifier" === "a")
      .select("v").as[Long].head() === 10L)
    // time travel to the retained previous generation
    assert(store.nodeAt("Thing", 0).filter($"identifier" === "a")
      .select("v").as[Long].head() === 1L)

    setV("a", 20L) // -> logical gen 2: legacy root (gen 0) is vacuumed
    setV("a", 30L) // -> logical gen 3: a's bucket's gen-1 dir is vacuumed
    assert(store.generationOf("Thing") === 3)
    val tdir = new java.io.File(s"$root/g3/nodes/Thing")
    val names = Option(tdir.listFiles()).toSeq.flatten.map(_.getName).toSet
    // the first rewrite bucketed the table: generations live under
    // pkb=<b>/, keyed by the pk hash — "a"'s point writes advance ONLY
    // its own bucket (gen dirs carry writer-unique tokens _gen-<n>-<tok>)
    assert(names.exists(_.startsWith("pkb=")), names.toString)
    assert(!names.exists(_.startsWith("_gen-")), names.toString)
    assert(!names.exists(n => n.startsWith("part-")), s"legacy files survive: $names")
    val aBucket = spark.range(1).select(
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.lit("a")),
        org.apache.spark.sql.functions.lit(16L))).head().getLong(0).toInt
    val aDir = new java.io.File(tdir, s"pkb=$aBucket")
    val aGens = Option(aDir.listFiles()).toSeq.flatten.map(_.getName).toSet
    assert(aGens.exists(_.startsWith("_gen-2-")) &&
      aGens.exists(_.startsWith("_gen-3-")), aGens.toString)
    assert(!aGens.exists(_.startsWith("_gen-1-")), aGens.toString)
    // untouched buckets still sit at their first-rewrite generation
    val otherGens = (0 until 16).filter(_ != aBucket).flatMap { b =>
      Option(new java.io.File(tdir, s"pkb=$b").listFiles()).toSeq.flatten
        .map(_.getName)
    }
    assert(otherGens.nonEmpty && otherGens.forall(_.startsWith("_gen-1-")),
      otherGens.toString)
    // previous generation still time-travels; vacuumed ones fail loudly
    assert(store.nodeAt("Thing", 2).filter($"identifier" === "a")
      .select("v").as[Long].head() === 20L)
    val e = intercept[IllegalArgumentException](store.nodeAt("Thing", 1))
    assert(e.getMessage.contains("not retained"), e.getMessage)
    // appends land in the active generation and survive the next rewrite
    assert(store.ingestNodes("Thing", Seq(("c", 3L)).toDF("identifier", "v")) === 1L)
    setV("b", 99L)
    assert(store.node("Thing").count() === 3)
  }

  test("schema evolution on read: extension-added properties surface as typed nulls and accept SET") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    val v1 = new GraphStore(spark, root, "g4", nationSchema)
    v1.ingestNodes("Thing", Seq(("a", 1L), ("b", 2L)).toDF("identifier", "v"))

    val v2schema = CustomSchemaJson.parse(
      """{"name":"locked","version":"2.0",
        "nodes":[{"name":"Thing","properties":[
          {"name":"identifier","type":"STRING","is_primary_key":true},
          {"name":"v","type":"INT64"},
          {"name":"note","type":"STRING"},
          {"name":"tags","type":"LIST<STRING>"}]}],
        "relationships":[]}""")
    val v2 = new GraphStore(spark, root, "g4", v2schema)
    // stored before the extension: new columns read as typed nulls
    val row = v2.node("Thing").filter($"identifier" === "a")
      .select("v", "note", "tags").head()
    assert(row.getLong(0) === 1L && row.isNullAt(1) && row.isNullAt(2))
    // SET on the evolved column works and the rewrite materializes it
    assert(v2.updateNodeProps("Thing",
      Seq(("a", "hello")).toDF("__key", "note")) === 1L)
    val back = v2.node("Thing").orderBy("identifier")
      .select("identifier", "note").collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
    assert(back.toSeq === Seq(("a", Some("hello")), ("b", None)))
    // ingest under the evolved schema conforms as usual
    assert(v2.ingestNodes("Thing", Seq(("c", 3L, "n3", Seq("x")))
      .toDF("identifier", "v", "note", "tags")) === 1L)
    assert(v2.node("Thing").count() === 3)
  }

  // ---- advisor's XLS/XLSX edge cases --------------------------------------


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
