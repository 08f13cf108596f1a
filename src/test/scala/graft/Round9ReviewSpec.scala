package graft

import graft.schema.CustomSchemaJson
import graft.storage.GraphStore

/** Round-9 hardening regressions from the round-8 review:
  *  - deleteByFileId must read the ACTIVE generation, not the table
  *    root — once a SET/DELETE has moved the table into `_gen-<n>`
  *    layout, a root read silently rewrites from the stale gen-0
  *    snapshot (losing every intervening update), and after vacuum it
  *    fails on an empty directory.
  *  - deleteNodes returns the DELETED-row count, not the distinct
  *    requested-key count (deleting an absent key must report 0).
  */
class Round9ReviewSpec extends SparkTestBase {

  private def thingSchema = CustomSchemaJson.parse(
    """{"name":"r9","version":"1.0",
      "nodes":[{"name":"Thing","properties":[
        {"name":"identifier","type":"STRING","is_primary_key":true},
        {"name":"v","type":"INT64"}]}],
      "relationships":[]}""")

  test("deleteFileData after a generation rewrite keeps the SET, not the stale snapshot") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-r9-del").toString
    val store = new GraphStore(spark, root, "g1", thingSchema)
    store.ingestNodes("Thing",
      Seq(("a", 1L), ("b", 2L)).toDF("identifier", "v"), fileId = Some("f1"))
    store.ingestNodes("Thing",
      Seq(("c", 3L)).toDF("identifier", "v"), fileId = Some("f2"))
    // enter generation layout: the table root's files are now stale
    assert(store.updateNodeProps("Thing",
      Seq(("a", 10L)).toDF("__key", "v")) === 1L)
    assert(store.generationOf("Thing") === 1)

    store.deleteFileData("Thing", "f2")
    val left = store.node("Thing").orderBy("identifier")
      .select("identifier", "v").collect().map(r => (r.getString(0), r.getLong(1)))
    // c (file f2) gone; the SET on a SURVIVES the un-ingest
    assert(left.toSeq === Seq(("a", 10L), ("b", 2L)))

    // two more rewrites vacuum the legacy root files entirely; the
    // delete path must still resolve the active generation
    assert(store.updateNodeProps("Thing",
      Seq(("b", 20L)).toDF("__key", "v")) === 1L)
    assert(store.updateNodeProps("Thing",
      Seq(("b", 30L)).toDF("__key", "v")) === 1L)
    store.deleteFileData("Thing", "f1")
    assert(store.node("Thing").count() === 0)
  }

  test("mmrSelect stops early when candidates run out before k") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)), (3L, Array(1.0f, 1.0f)))
      .toDF("id", "emb")
    val got = graft.operators.PipelineContext.run { implicit ctx =>
      graft.operators.Similarity.mmrSelect(
        corpus, "id", "emb", Seq(1.0f, 0.0f), k = 10,
        excludeIds = Seq(3L)).collect()
    }
    assert(got.length === 2) // only 2 candidates exist; no throw
    assert(got.map(_.getLong(1)).toSet === Set(1L, 2L))
  }

  private def graphSchema = CustomSchemaJson.parse(
    """{"name":"r9g","version":"1.0",
      "nodes":[{"name":"Thing","properties":[
        {"name":"identifier","type":"STRING","is_primary_key":true},
        {"name":"v","type":"INT64"}]}],
      "relationships":[{"name":"LINKS","from_node":"Thing","to_node":"Thing",
        "properties":[{"name":"w","type":"INT64"}]}]}""")

  test("graph commit is all-or-nothing: a crash between two tables' rewrites leaves the old consistent state") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft-r9-txn").toString
    val store = new GraphStore(spark, root, "g3", graphSchema)
    store.ingestNodes("Thing",
      Seq(("a", 1L), ("b", 2L)).toDF("identifier", "v"))
    store.ingestRels("LINKS",
      Seq(("a", "b", 7L)).toDF("from", "to", "w"))
    // enter generation layout on both tables
    assert(store.deleteNodes("Thing", Seq("zzz").toDF("k"), detach = true) === 0L)
    val nodesBefore = store.node("Thing").select("identifier", "v")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val relsBefore = store.rel("LINKS").count()

    // crash INJECTED mid-commit: the first table's snapshot lands, the
    // second table's write action throws before the manifest swap
    val boom = store.rel("LINKS")
      .withColumn("w", when(lit(true), raise_error(lit("injected crash"))).cast("long"))
    intercept[Exception] {
      store.commitGenerations(Seq(
        store.nodePath("Thing") ->
          store.node("Thing").filter(col("identifier") =!= "a"),
        store.relPath("LINKS") -> boom))
    }
    // readers see the OLD state of BOTH tables — the node delete that
    // already landed its _gen dir is invisible without the swap
    assert(store.node("Thing").select("identifier", "v")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet === nodesBefore)
    assert(store.rel("LINKS").count() === relsBefore)

    // and a clean DETACH DELETE commits node+rel together
    assert(store.deleteNodes("Thing", Seq("a").toDF("k"), detach = true) === 1L)
    assert(store.node("Thing").count() === 1L)
    assert(store.rel("LINKS").count() === 0L)
  }

  test("tokenBudgetSample two-level prefix sum equals the single-window form on a whale source") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // one whale source (9 of every 10 docs) plus a minnow; text token
    // counts vary so budget boundaries cut inside md5 groups
    val docs = (1 to 2000).map { i =>
      (i.toLong, if (i % 10 == 0) "minnow" else "whale",
        Seq.fill(1 + i % 17)(s"tok$i").mkString(" "))
    }.toDF("doc_id", "src", "text")
    val got = graft.operators.CurationPipeline
      .tokenBudgetSample(docs, "doc_id", "text", "src", budgetTokens = 4000)
      .select("source", "id", "tokens")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // reference: the original single-window-per-source running sum
    val toks = lit(1) + length(col("text")) -
      length(regexp_replace(col("text"), " ", ""))
    val ord = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 10000
    val w = Window.partitionBy(col("source")).orderBy(col("__ord"), col("id"))
    val ref = docs.select(col("src").as("source"), col("doc_id").as("id"),
      toks.cast("long").as("tokens"), ord.as("__ord"))
      .withColumn("__off", coalesce(sum(col("tokens")).over(w) - col("tokens"), lit(0L)))
      .filter(col("__off") < 4000)
      .select("source", "id", "tokens")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === ref)
    assert(got.nonEmpty && got.exists(_._1 == "whale") && got.exists(_._1 == "minnow"))
  }

  test("deleteNodes reports deleted rows, so an absent key counts 0") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-r9-cnt").toString
    val store = new GraphStore(spark, root, "g2", thingSchema)
    store.ingestNodes("Thing", Seq(("a", 1L), ("b", 2L)).toDF("identifier", "v"))
    assert(store.deleteNodes("Thing",
      Seq("zzz").toDF("k"), detach = false) === 0L)
    assert(store.deleteNodes("Thing",
      Seq("a", "missing").toDF("k"), detach = false) === 1L)
    assert(store.node("Thing").count() === 1)
  }
}
