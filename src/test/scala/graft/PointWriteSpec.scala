package graft

import org.apache.spark.sql.functions._

import graft.schema.CustomSchemaJson
import graft.storage.GraphStore

/** Point-write scope on pk-hash-bucketed tables: the round-11 feature's
  * direct coverage (previously only exercised incidentally). Pins that
  * a single-key SET reads and rewrites EXACTLY the bucket its key
  * hashes into — the 1/B-of-the-table contract a 100 TB graph depends
  * on — plus the empty-vs-vacuumed bucket distinction and the
  * commitTables stray-row guard. */
class PointWriteSpec extends SparkTestBase {
  import spark.implicits._

  private def thingSchema = CustomSchemaJson.parse(
    """{"name":"pw","version":"1.0",
      "nodes":[{"name":"Thing","properties":[
        {"name":"identifier","type":"STRING","is_primary_key":true},
        {"name":"v","type":"INT64"}]}],
      "relationships":[]}""")

  private def freshStore(tag: String): GraphStore = {
    val root = java.nio.file.Files.createTempDirectory(s"graft-$tag").toString
    new GraphStore(spark, root, "g", thingSchema)
  }

  private def bucketOf(key: String, nB: Int): Int =
    spark.range(1).select(pmod(xxhash64(lit(key)), lit(nB.toLong)))
      .head().getLong(0).toInt

  /** Recursive (relativePath, length, mtime) listing of a dir. */
  private def listing(d: java.io.File): Set[(String, Long, Long)] = {
    def walk(f: java.io.File, pre: String): Seq[(String, Long, Long)] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten
          .flatMap(c => walk(c, s"$pre${c.getName}/"))
      else Seq((pre.stripSuffix("/"), f.length(), f.lastModified()))
    walk(d, "").toSet
  }

  test("a single-key SET reads and rewrites exactly the touched bucket") {
    val store = freshStore("pw1")
    val tdir = new java.io.File(s"${store.root}/g/nodes/Thing")
    store.ingestNodes("Thing",
      (0 until 32).map(i => (s"k$i", i.toLong)).toDF("identifier", "v"))

    // first rewrite bucketizes the whole table
    assert(store.updateNodeProps("Thing",
      Seq(("k0", 100L)).toDF("__key", "v")) === 1L)
    assert(store.generationOf("Thing") === 1)
    val nB = store.pkBuckets
    val b0 = bucketOf("k0", nB)

    // pick a target key in a bucket other than k0's, and a third
    // populated bucket to poison
    val byBucket = (0 until 32).map(i => s"k$i").groupBy(bucketOf(_, nB))
    val (bTarget, targetKeys) = byBucket.find(_._1 != b0).get
    val target = targetKeys.head
    val bPoison = byBucket.keys.find(b => b != b0 && b != bTarget).get

    // plant a garbage "parquet" file in a DIFFERENT populated bucket:
    // if the point write scanned that bucket, the parquet read would
    // fail loudly — succeeding proves the untouched bucket was never
    // READ, not just never rewritten
    val poisonGen = Option(new java.io.File(tdir, s"pkb=$bPoison").listFiles())
      .toSeq.flatten.find(_.getName.startsWith("_gen-")).get
    val poison = new java.io.File(poisonGen, "part-poison.parquet")
    java.nio.file.Files.write(poison.toPath, "not parquet".getBytes("UTF-8"))

    val before = (0 until nB).map(b =>
      b -> listing(new java.io.File(tdir, s"pkb=$b"))).toMap

    assert(store.updateNodeProps("Thing",
      Seq((target, 200L)).toDF("__key", "v")) === 1L)
    assert(store.generationOf("Thing") === 2)

    val after = (0 until nB).map(b =>
      b -> listing(new java.io.File(tdir, s"pkb=$b"))).toMap
    // ONLY the target's bucket changed: a new _gen-2- dir appeared
    // there, every other bucket's files (names, sizes, mtimes) are
    // byte-identical — the rewrite never copied, linked, or rewrote
    // them
    (0 until nB).filter(_ != bTarget).foreach { b =>
      assert(after(b) === before(b), s"untouched bucket $b changed")
    }
    assert(after(bTarget) !== before(bTarget))
    assert(Option(new java.io.File(tdir, s"pkb=$bTarget").listFiles()).toSeq
      .flatten.exists(_.getName.startsWith("_gen-2-")))

    // full-state read is correct once the poison is removed
    assert(poison.delete())
    val state = store.node("Thing")
      .select("identifier", "v").as[(String, Long)].collect().toMap
    assert(state.size === 32)
    assert(state("k0") === 100L && state(target) === 200L)
    assert(state("k31") === (if (target == "k31") 200L else 31L))
  }

  test("appends land in active bucket generations and survive the next rewrite") {
    val store = freshStore("pw2")
    val tdir = new java.io.File(s"${store.root}/g/nodes/Thing")
    store.ingestNodes("Thing",
      (0 until 8).map(i => (s"k$i", i.toLong)).toDF("identifier", "v"))
    store.updateNodeProps("Thing", Seq(("k0", 100L)).toDF("__key", "v")): Unit

    // append AFTER bucketization: the new row must land inside its
    // bucket's ACTIVE generation dir (never at the table root)
    assert(store.ingestNodes("Thing",
      Seq(("extra", 99L)).toDF("identifier", "v")) === 1L)
    val bExtra = bucketOf("extra", store.pkBuckets)
    val genDir = Option(new java.io.File(tdir, s"pkb=$bExtra").listFiles())
      .toSeq.flatten.find(_.getName.startsWith("_gen-")).get
    assert(Option(genDir.listFiles()).toSeq.flatten
      .exists(f => f.isFile && f.getName.endsWith(".parquet")))

    // the append survives a subsequent point write on another key
    store.updateNodeProps("Thing", Seq(("k1", 11L)).toDF("__key", "v")): Unit
    // …after which the gen-0 root files (retained as "previous" after
    // the FIRST rewrite only) are vacuumed
    assert(!Option(tdir.listFiles()).toSeq.flatten
      .exists(f => f.isFile && f.getName.startsWith("part-")))
    val state = store.node("Thing")
      .select("identifier", "v").as[(String, Long)].collect().toMap
    assert(state("extra") === 99L && state("k0") === 100L && state("k1") === 11L)
    assert(state.size === 9)
  }

  test("nodeAt across bucketed generations returns exact pre-write state") {
    val store = freshStore("pw3")
    store.ingestNodes("Thing",
      (0 until 8).map(i => (s"k$i", i.toLong)).toDF("identifier", "v"))
    store.updateNodeProps("Thing", Seq(("k0", 100L)).toDF("__key", "v")): Unit // gen 1
    store.updateNodeProps("Thing", Seq(("k1", 200L)).toDF("__key", "v")): Unit // gen 2
    val gen1 = store.nodeAt("Thing", 1)
      .select("identifier", "v").as[(String, Long)].collect().toMap
    assert(gen1("k0") === 100L && gen1("k1") === 1L && gen1.size === 8)
    val gen2 = store.nodeAt("Thing", 2)
      .select("identifier", "v").as[(String, Long)].collect().toMap
    assert(gen2("k0") === 100L && gen2("k1") === 200L && gen2.size === 8)
  }

  test("vacuumed bucket generations fail loudly; empty buckets read fine") {
    val store = freshStore("pw4")
    // two keys only: most buckets are EMPTY after bucketization — the
    // read must treat their (dir present, no files) state as empty,
    // not as missing data
    store.ingestNodes("Thing",
      Seq(("a", 1L), ("b", 2L)).toDF("identifier", "v"))
    store.updateNodeProps("Thing", Seq(("a", 10L)).toDF("__key", "v")): Unit // gen 1
    assert(store.node("Thing").count() === 2)
    store.updateNodeProps("Thing", Seq(("a", 20L)).toDF("__key", "v")): Unit // gen 2
    store.updateNodeProps("Thing", Seq(("a", 30L)).toDF("__key", "v")): Unit // gen 3
    // gen 1's dir for a's bucket is vacuumed: time travel to it must
    // fail loudly, NOT return a table silently missing a's rows
    val e = intercept[IllegalArgumentException](store.nodeAt("Thing", 1).collect())
    assert(e.getMessage.contains("not retained"), e.getMessage)
    // retained generation still reads exactly
    val gen2 = store.nodeAt("Thing", 2)
      .select("identifier", "v").as[(String, Long)].collect().toMap
    assert(gen2 === Map("a" -> 20L, "b" -> 2L))
  }

  test("pre-upgrade emptied bucket (dir-less gen, older dir retained) reads as empty") {
    val store = freshStore("pw4b")
    val tdir = new java.io.File(s"${store.root}/g/nodes/Thing")
    store.ingestNodes("Thing",
      (0 until 32).map(i => (s"k$i", i.toLong)).toDF("identifier", "v"))
    store.updateNodeProps("Thing", Seq(("k0", 10L)).toDF("__key", "v")): Unit // gen 1
    val nB = store.pkBuckets
    val byBucket = (0 until 32).map(i => s"k$i").groupBy(bucketOf(_, nB))
    // empty one populated bucket via a delete (bucket-scoped rewrite →
    // gen 2 names an EMPTY dir there), then remove that dir to emulate
    // the pre-upgrade commit layout that never created it — while
    // retention keeps the bucket's gen-1 data dir alongside
    val (bVictim, victims) = byBucket.find(_._1 != bucketOf("k0", nB)).get
    assert(store.deleteNodes("Thing", victims.toDF("k"), detach = false) ===
      victims.size.toLong)
    val bDir = new java.io.File(tdir, s"pkb=$bVictim")
    val named = Option(bDir.listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("_gen-2-"))
    assert(named.nonEmpty, "the emptying rewrite should have created its gen dir")
    named.foreach { d =>
      Option(d.listFiles()).toSeq.flatten.foreach(f => assert(f.delete()))
      assert(d.delete())
    }
    assert(Option(bDir.list()).toSeq.flatten.exists(_.startsWith("_gen-1-")),
      "scenario needs the older generation retained in the bucket")
    // the read must classify the bucket as pre-upgrade-empty (all
    // retained gens OLDER than the named one), not as vacuumed
    val state = store.node("Thing")
      .select("identifier", "v").as[(String, Long)].collect().toMap
    assert(state.size === 32 - victims.size)
    assert(state("k0") === 10L)
    assert(victims.forall(!state.contains(_)))
  }

  test("retainGenerations widens the reader lease: gen kept at 3, vacuumed at 2") {
    // default (2 = current + previous): the existing vacuumed-fails
    // test pins the eviction; here a 3-generation store keeps the
    // grandparent generation time-travelable after the same mutations
    val root = java.nio.file.Files.createTempDirectory("graft-pw-ret").toString
    val store = new GraphStore(spark, root, "g", thingSchema,
      retainGenerations = 3)
    store.ingestNodes("Thing",
      Seq(("a", 1L), ("b", 2L)).toDF("identifier", "v"))
    store.updateNodeProps("Thing", Seq(("a", 10L)).toDF("__key", "v")): Unit // gen 1
    store.updateNodeProps("Thing", Seq(("a", 20L)).toDF("__key", "v")): Unit // gen 2
    store.updateNodeProps("Thing", Seq(("a", 30L)).toDF("__key", "v")): Unit // gen 3
    // gen 1 is head−2: retained under retainGenerations=3 (a default
    // store evicts it — the sibling test asserts exactly that)
    val gen1 = store.nodeAt("Thing", 1)
      .select("identifier", "v").as[(String, Long)].collect().toMap
    assert(gen1 === Map("a" -> 10L, "b" -> 2L))
    store.updateNodeProps("Thing", Seq(("a", 40L)).toDF("__key", "v")): Unit // gen 4
    // now gen 1 is head−3: vacuumed, and LOUDLY so
    val e = intercept[IllegalArgumentException](store.nodeAt("Thing", 1).collect())
    assert(e.getMessage.contains("not retained"), e.getMessage)
    assert(store.nodeAt("Thing", 2)
      .select("identifier", "v").as[(String, Long)].collect().toMap ===
      Map("a" -> 20L, "b" -> 2L))
    intercept[IllegalArgumentException](
      new GraphStore(spark, root, "g2", thingSchema, retainGenerations = 1))
  }

  test("a bucketed table reads as ONE FileScan, not a per-bucket union") {
    val store = freshStore("pwplan")
    store.ingestNodes("Thing",
      (0 until 32).map(i => (s"k$i", i.toLong)).toDF("identifier", "v"))
    store.updateNodeProps("Thing", Seq(("k0", 1L)).toDF("__key", "v")): Unit
    val plan = store.node("Thing").queryExecution.executedPlan.toString
    // at a production bucket count a union of B scans is B listings
    // and B-way planning per read — the multi-path single scan is the
    // round-12 pin
    assert(plan.linesIterator.count(_.contains("FileScan")) === 1, plan)
    assert(!plan.contains("Union"), plan)
  }

  test("DETACH DELETE is bucket-scoped on the node table and FROM-side rels") {
    val schema = CustomSchemaJson.parse(
      """{"name":"pwdel","version":"1.0",
        "nodes":[
          {"name":"User","properties":[
            {"name":"identifier","type":"STRING","is_primary_key":true}]},
          {"name":"Item","properties":[
            {"name":"identifier","type":"STRING","is_primary_key":true}]}],
        "relationships":[
          {"name":"OWNS","from_node":"User","to_node":"Item"},
          {"name":"LIKED","from_node":"Item","to_node":"User"}]}""")
    val root = java.nio.file.Files.createTempDirectory("graft-pwdel").toString
    val store = new GraphStore(spark, root, "g", schema)
    val users = (0 until 32).map(i => s"u$i")
    store.ingestNodes("User", users.toDF("identifier"))
    store.ingestNodes("Item", (0 until 32).map(i => s"i$i").toDF("identifier"))
    store.ingestRels("OWNS",
      (0 until 32).map(i => (s"u$i", s"i$i")).toDF("from", "to"))
    store.ingestRels("LIKED",
      (0 until 32).map(i => (s"i$i", s"u$i")).toDF("from", "to"))

    // first detach-delete bucketizes User, OWNS and LIKED (whole-table)
    assert(store.deleteNodes("User", Seq("u0").toDF("k"), detach = true) === 1L)
    val nB = store.pkBuckets
    val userDir = new java.io.File(s"$root/g/nodes/User")
    val ownsDir = new java.io.File(s"$root/g/rels/OWNS")
    def snap(d: java.io.File) = (0 until nB).map(b =>
      b -> listing(new java.io.File(d, s"pkb=$b"))).toMap

    val likedDir = new java.io.File(s"$root/g/rels/LIKED")
    val target = users.find(u => u != "u0" &&
      bucketOf(u, nB) != bucketOf("u0", nB)).get
    val bT = bucketOf(target, nB)
    // LIKED is TO-side for User: its victim row (i<k> → <target>) sits
    // in the bucket of its SRC item — the probe must find exactly it
    val bLiked = bucketOf("i" + target.stripPrefix("u"), nB)
    val (userBefore, ownsBefore, likedBefore) =
      (snap(userDir), snap(ownsDir), snap(likedDir))
    assert(store.deleteNodes("User", Seq(target).toDF("k"), detach = true) === 1L)
    val (userAfter, ownsAfter, likedAfter) =
      (snap(userDir), snap(ownsDir), snap(likedDir))
    // only the deleted key's bucket changed — in the node table, in
    // the src-keyed OWNS table, AND (round 13) in the dst-probed LIKED
    // table: the TO-side rewrite touches exactly the src buckets the
    // probe found victims in, every other bucket byte-identical
    (0 until nB).filter(_ != bT).foreach { b =>
      assert(userAfter(b) === userBefore(b), s"User bucket $b changed")
      assert(ownsAfter(b) === ownsBefore(b), s"OWNS bucket $b changed")
    }
    (0 until nB).filter(_ != bLiked).foreach { b =>
      assert(likedAfter(b) === likedBefore(b), s"LIKED bucket $b changed")
    }
    assert(userAfter(bT) !== userBefore(bT))
    assert(ownsAfter(bT) !== ownsBefore(bT))
    assert(likedAfter(bLiked) !== likedBefore(bLiked))
    // full-state correctness across all three tables
    assert(store.node("User").count() === 30)
    assert(store.rel("OWNS").filter(col("src").isin("u0", target)).count() === 0)
    assert(store.rel("LIKED").filter(col("dst").isin("u0", target)).count() === 0)
    assert(store.rel("OWNS").count() === 30)
    assert(store.rel("LIKED").count() === 30)
  }

  test("DETACH DELETE of a node with no in-edges leaves the TO-side rel table untouched") {
    val schema = CustomSchemaJson.parse(
      """{"name":"pwdel2","version":"1.0",
        "nodes":[
          {"name":"User","properties":[
            {"name":"identifier","type":"STRING","is_primary_key":true}]},
          {"name":"Item","properties":[
            {"name":"identifier","type":"STRING","is_primary_key":true}]}],
        "relationships":[
          {"name":"LIKED","from_node":"Item","to_node":"User"}]}""")
    val root = java.nio.file.Files.createTempDirectory("graft-pwdel2").toString
    val store = new GraphStore(spark, root, "g", schema)
    store.ingestNodes("User", (0 until 16).map(i => s"u$i").toDF("identifier"))
    store.ingestNodes("Item", (0 until 16).map(i => s"i$i").toDF("identifier"))
    // u15 has NO in-edges; everyone else has one
    store.ingestRels("LIKED",
      (0 until 15).map(i => (s"i$i", s"u$i")).toDF("from", "to"))
    // bucketize both tables first
    assert(store.deleteNodes("User", Seq("u0").toDF("k"), detach = true) === 1L)
    val likedDir = new java.io.File(s"$root/g/rels/LIKED")
    val nB = store.pkBuckets
    def snap = (0 until nB).map(b =>
      b -> listing(new java.io.File(likedDir, s"pkb=$b"))).toMap
    val before = snap
    // an empty probe (no LIKED row has dst=u15) must skip the rel
    // table ENTIRELY — no bucket rewritten, not even a new generation
    assert(store.deleteNodes("User", Seq("u15").toDF("k"), detach = true) === 1L)
    assert(snap === before, "LIKED must be untouched by a no-victim detach")
    assert(store.rel("LIKED").count() === 14)
  }

  test("TO-side probe pushes a literal IN on dst into the parquet scan (r14 pin)") {
    val schema = CustomSchemaJson.parse(
      """{"name":"pwprobe","version":"1.0",
        "nodes":[
          {"name":"User","properties":[
            {"name":"identifier","type":"STRING","is_primary_key":true}]},
          {"name":"Item","properties":[
            {"name":"identifier","type":"STRING","is_primary_key":true}]}],
        "relationships":[
          {"name":"LIKED","from_node":"Item","to_node":"User"}]}""")
    val root = java.nio.file.Files.createTempDirectory("graft-pwprobe").toString
    val store = new GraphStore(spark, root, "g", schema)
    store.ingestNodes("User", (0 until 16).map(i => s"u$i").toDF("identifier"))
    store.ingestNodes("Item", (0 until 16).map(i => s"i$i").toDF("identifier"))
    store.ingestRels("LIKED",
      (0 until 16).map(i => (s"i$i", s"u$i")).toDF("from", "to"))
    // bucketize via a first detach so the probe runs the real scoped path
    assert(store.deleteNodes("User", Seq("u0").toDF("k"), detach = true) === 1L)
    val nB = store.pkBuckets
    val k = Seq("u3").toDF("k")
      .select(col("k").cast("string").as("__key")).distinct()
    val probe = store.toSideProbeFrame(s"$root/g/rels/LIKED",
      schema.rel("LIKED").structType, k, Seq("u3"), nB)
    // correct bucket set: exactly the src bucket of the victim row
    assert(probe.collect().map(_.getLong(0).toInt).toSet ===
      Set(bucketOf("i3", nB)))
    // and the key set reached the parquet reader as a LITERAL filter —
    // the row-group min/max skipping mechanism the doc claims (a join
    // side never appears in PushedFilters)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.matches(
      "(?s).*PushedFilters: \\[[^]]*(In|EqualTo)\\(dst,[^)]*u3[^)]*\\).*"), plan)
  }

  test("commitTables refuses a point write whose rows hash outside the touched scope") {
    val store = freshStore("pw5")
    store.ingestNodes("Thing",
      (0 until 8).map(i => (s"k$i", i.toLong)).toDF("identifier", "v"))
    store.updateNodeProps("Thing", Seq(("k0", 100L)).toDF("__key", "v")): Unit
    val path = s"${store.root}/g/nodes/Thing"
    val nB = store.pkBuckets
    val rows = Seq(("k1", 1L), ("k2", 2L))
      .toDF("identifier", "v")
      .withColumn("file_id", lit(null).cast("string"))
    val Seq(bK1, bK2) = Seq("k1", "k2").map(bucketOf(_, nB))
    assert(bK1 !== bK2, "fixture keys must hash to different buckets")
    val e = intercept[IllegalStateException] {
      store.commitTables(Seq((path, rows, Some(Seq(bK1)))))
    }
    assert(e.getMessage.contains("refusing to drop"), e.getMessage)
    // nothing committed: state unchanged and readable
    val state = store.node("Thing")
      .select("identifier", "v").as[(String, Long)].collect().toMap
    assert(state("k0") === 100L && state.size === 8)
  }
}
