package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, PipelineContext}
import graft.sources.Tables

/** Round-10 regressions: the t42 scratch-straggler race (release must
  * not delete scratch dirs under an in-flight reader) and repeated
  * segmented-path invocations staying stable and identical. */
class Round10ReviewSpec extends SparkTestBase {

  test("release waits for an in-flight reader of a scratch dir (t42 straggler race)") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val ctx = new PipelineContext
    val dir = ctx.scratchDir("graft-race")
    spark.range(0, 1000, 1, 4).toDF("id").write.parquet(s"$dir/t")
    val df = spark.read.parquet(s"$dir/t")
    // A slow consumer standing in for the AQE broadcast straggler: each
    // task sleeps BEFORE pulling rows, so the parquet read happens
    // while release() is (without the quiesce barrier) deleting the
    // files under it — the round-9 FAILED_READ_FILE flake, on demand.
    val slow = Future {
      df.rdd.mapPartitions { it => Thread.sleep(400); it }.count()
    }(ExecutionContext.global)
    val deadline = System.currentTimeMillis() + 10000
    while (spark.sparkContext.statusTracker.getActiveJobIds().isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(5)
    assert(spark.sparkContext.statusTracker.getActiveJobIds().nonEmpty,
      "straggler job never became active")
    ctx.release() // must wait for the straggler before deleting
    assert(Await.result(slow, 60.seconds) === 1000L)
  }

  test("segmented exact-Jaccard survives rapid repeated invocations") {
    val docs = Tables.documents(spark, sfDir)
    def run(): Seq[(Long, Long, Double)] = PipelineContext.run { implicit ctx =>
      Dedup.jaccardPairsExact(docs, "doc_id", "text",
        shingle = Dedup.WordGrams(2), minJaccard = 0.4,
        maxCandidatesPerBlock = 300000L) // sf0.001 volume ~805k -> 3 blocks
        .orderBy(col("id1"), col("id2"))
        .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
    val first = run()
    assert(first.nonEmpty)
    // back-to-back reruns race each release's scratch delete against
    // the next invocation's jobs; results must stay identical and no
    // invocation may fail
    (1 to 3).foreach(_ => assert(run() === first))
  }

  // ---- object-store-safe commit (CAS manifest) ---------------------------

  import graft.schema.CustomSchemaJson
  import graft.storage.{CasFiles, CommitConflictException, GraphStore}

  private def thingSchema = CustomSchemaJson.parse(
    """{"name":"r10","version":"1.0",
      "nodes":[{"name":"Thing","properties":[
        {"name":"identifier","type":"STRING","is_primary_key":true},
        {"name":"v","type":"INT64"}]}],
      "relationships":[]}""")

  test("putIfAbsent: exactly one of 16 concurrent writers wins the name, with untorn content") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cas").toFile
    val target = new java.io.File(dir, "_manifest.v1")
    val bodies = (0 until 16).map(i => s"writer-$i\n" * 50)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    val start = new java.util.concurrent.CountDownLatch(1)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = bodies.map { b =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          if (CasFiles.putIfAbsent(target, b.getBytes("UTF-8"))) wins.incrementAndGet()
        }
      })
    }
    start.countDown()
    tasks.foreach(_.get())
    pool.shutdown()
    assert(wins.get() === 1, "exactly one conditional put must win")
    val content = new String(
      java.nio.file.Files.readAllBytes(target.toPath), "UTF-8")
    // the published file is ONE writer's body in full — never a torn mix
    assert(bodies.contains(content))
  }

  test("two-writers race: the commit that loses the manifest CAS fails loudly and leaves no orphans") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-r10-cas").toString
    val store = new GraphStore(spark, root, "g1", thingSchema)
    store.ingestNodes("Thing",
      Seq(("a", 1L), ("b", 2L)).toDF("identifier", "v"))
    assert(store.updateNodeProps("Thing",
      Seq(("a", 10L)).toDF("__key", "v")) === 1L) // head: _manifest.v1
    val gdir = new java.io.File(s"$root/g1")
    def versions = gdir.list().toSeq
      .filter(_.matches("_manifest\\.v\\d+"))
      .map(_.stripPrefix("_manifest.v").toInt).sorted
    val v = versions.max
    // The foreign writer (another HOST — the advisory FileChannel lock
    // cannot see it on shared/object storage) publishes version v+1
    // first. Injected from inside the local commit's own generation
    // write, i.e. deterministically AFTER this commit read head=v and
    // BEFORE its CAS — the exact window the protocol must lose in.
    val foreignBody = java.nio.file.Files.readAllBytes(
      new java.io.File(gdir, s"_manifest.v$v").toPath)
    val foreign = new java.io.File(gdir, s"_manifest.v${v + 1}")
    val trapped = Seq(("z", 99L)).toDF("identifier", "v")
      .as[(String, Long)]
      .mapPartitions { it => CasFiles.putIfAbsent(foreign, foreignBody); it }
      .toDF("identifier", "v")
    val path = store.nodePath("Thing")
    def genDirs = Option(new java.io.File(path).list()).toSeq.flatten
      .filter(_.startsWith("_gen-")).toSet
    val before = genDirs
    intercept[CommitConflictException] {
      store.commitGenerations(Seq(path -> trapped))
    }
    // the foreign commit is intact and authoritative
    assert(new String(java.nio.file.Files.readAllBytes(foreign.toPath), "UTF-8")
      === new String(foreignBody, "UTF-8"))
    // the loser's unpublished generation dir was cleaned up, and ONLY
    // that (writer-unique names: published dirs are untouchable by a
    // loser's rollback by construction)
    assert(genDirs === before,
      "conflict rollback must remove the loser's dir and nothing else")
    // the store still reads the winner's consistent state...
    assert(store.node("Thing").orderBy("identifier")
      .select("identifier", "v").as[(String, Long)].collect().toSeq
      === Seq(("a", 10L), ("b", 2L)))
    // ...and a RETRY against the new head succeeds
    assert(store.updateNodeProps("Thing",
      Seq(("b", 20L)).toDF("__key", "v")) === 1L)
    assert(versions.max === v + 2)
  }

  test("legacy single-file _manifest reads correctly and retires on the next CAS commit") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-r10-mig").toString
    val store = new GraphStore(spark, root, "g1", thingSchema)
    store.ingestNodes("Thing",
      Seq(("a", 1L), ("b", 2L)).toDF("identifier", "v"))
    assert(store.updateNodeProps("Thing",
      Seq(("a", 10L)).toDF("__key", "v")) === 1L)
    val gdir = new java.io.File(s"$root/g1")
    // simulate a pre-upgrade layout: head demoted to the legacy name
    java.nio.file.Files.move(
      new java.io.File(gdir, "_manifest.v1").toPath,
      new java.io.File(gdir, "_manifest").toPath)
    assert(store.node("Thing").filter($"identifier" === "a")
      .select("v").as[Long].collect().head === 10L)
    // next commit goes through CAS and retires the legacy file
    assert(store.updateNodeProps("Thing",
      Seq(("b", 20L)).toDF("__key", "v")) === 1L)
    assert(!new java.io.File(gdir, "_manifest").exists())
    assert(new java.io.File(gdir, "_manifest.v1").exists())
    assert(store.node("Thing").orderBy("identifier")
      .select("v").as[Long].collect().toSeq === Seq(10L, 20L))
  }
}
