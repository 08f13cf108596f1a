package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.query.cypher.CypherWriter
import graft.schema._
import graft.storage.GraphStore

/** Driver-oracle gates for the WRITE surface (SURVEY.md §2.11) — until
  * round 7 writes were spec-verified only (CypherWriteSpec); these gates
  * put MERGE / SET += / DETACH DELETE / MATCH…CREATE on the same
  * evidence footing as the read operators.
  *
  * Shape of every gate: build a scratch graph in a fresh temp dir,
  * seed it deterministically from the sf parquet (nation/region), run
  * the Cypher WRITE statements the reference's write path emits
  * (plaid transactions.py MERGE-then-SET, neo4j.py:340 `SET n += map`,
  * connection_service.py DETACH DELETE, save_view.py:226-244
  * MATCH-anchored CREATE), then RE-READ the stored state and return it.
  * The DuckDB oracle replays the same end state relationally over the
  * ORIGINAL parquet tables — so a hash match proves the write rewrote
  * the tables to exactly the relationally-predicted state, not merely
  * that the statement ran.
  *
  * Scale note: the writes themselves go through GraphStore's
  * anti-join/rewrite primitives (one shuffle per table, no per-row
  * loops — the reference measured row-wise MERGE 40× slower than its
  * COPY path, ingest.py:588-665); the tiny nation/region seed is gate
  * plumbing, not the operator. */
object WriteQueries {

  private def pk = Property("identifier", GraftType.STRING, isPrimaryKey = true)
  private def writeSchema = GraphSchema("writegate", "1.0",
    Seq(
      NodeDef("Region", Seq(pk, Property("regionkey", GraftType.INT64))),
      NodeDef("Nation", Seq(pk, Property("nationkey", GraftType.INT64),
        Property("regionkey", GraftType.INT64),
        Property("status", GraftType.STRING))),
      NodeDef("Summary", Seq(pk, Property("score", GraftType.INT64)))),
    Seq(
      RelDef("NATION_IN_REGION", "Nation", "Region"),
      RelDef("REGION_HAS_SUMMARY", "Region", "Summary")))

  /** Fresh scratch store; Verify/Bench call gates repeatedly and state
    * must never leak across invocations. */
  private def scratch(spark: SparkSession): GraphStore =
    new GraphStore(spark, Files.createTempDirectory("graft-wgate").toString,
      "wgate", writeSchema)

  private def seedNations(store: GraphStore, sfDir: String): Unit = {
    val n = graft.sources.Tables.nation(store.spark, sfDir)
    store.ingestNodes("Nation", n.select(
      col("n_name").as("identifier"),
      col("n_nationkey").as("nationkey"),
      col("n_regionkey").as("regionkey")))
    ()
  }

  private def seedRegions(store: GraphStore, sfDir: String): Unit = {
    val r = graft.sources.Tables.region(store.spark, sfDir)
    store.ingestNodes("Region", r.select(
      col("r_name").as("identifier"),
      col("r_regionkey").as("regionkey")))
    ()
  }

  /** w01: MERGE upsert — an existing key is matched (no duplicate row)
    * and a new key is inserted, each followed by SET (the plaid
    * transactions.py MERGE-then-SET statement shape). */
  def w01MergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val store = scratch(spark)
    seedNations(store, sfDir)
    new CypherWriter(store).execute(
      """MERGE (t:Nation {identifier: 'ZEALANDIA'})
         SET t.regionkey = 9, t.status = 'new'""")
    new CypherWriter(store).execute(
      """MERGE (t:Nation {identifier: 'NATION_3'})
         SET t.regionkey = 9""")
    store.node("Nation").select("identifier", "regionkey", "status")
  }

  /** w02: `SET n += map` merge semantics over a matched set — absent
    * keys keep their values, null values remove the property
    * (neo4j.py:340's bulk-load dialect). */
  def w02SetMap(spark: SparkSession, sfDir: String): DataFrame = {
    val store = scratch(spark)
    seedNations(store, sfDir)
    new CypherWriter(store).execute(
      """MATCH (n:Nation) WHERE n.regionkey <= 2
         SET n += {status: 'amended'}""")
    new CypherWriter(store).execute(
      """MATCH (n:Nation) WHERE n.regionkey = 2
         SET n += {status: null, regionkey: 12}""")
    store.node("Nation").select("identifier", "regionkey", "status")
  }

  /** w03: DETACH DELETE a matched subtree — the nodes go AND every
    * relationship touching them goes (connection_service.py's
    * disconnect shape); surviving nodes keep their relationships. */
  def w03DetachDelete(spark: SparkSession, sfDir: String): DataFrame = {
    val store = scratch(spark)
    seedNations(store, sfDir)
    seedRegions(store, sfDir)
    val n = graft.sources.Tables.nation(spark, sfDir)
    val r = graft.sources.Tables.region(spark, sfDir)
    store.ingestRels("NATION_IN_REGION",
      n.join(r, col("n_regionkey") === col("r_regionkey"))
        .select(col("n_name").as("src"), col("r_name").as("dst")))
    new CypherWriter(store).execute(
      "MATCH (n:Nation) WHERE n.regionkey = 0 DETACH DELETE n")
    val nation = store.node("Nation")
    val rels = store.rel("NATION_IN_REGION")
    nation.join(rels, nation("identifier") === rels("src"))
      .select(col("identifier"), col("regionkey"), col("dst").as("region"))
  }

  /** w04: MATCH anchors + CREATE node-and-relationship per matched row
    * (save_view.py:226-244's fact+rels statement). */
  def w04MatchCreate(spark: SparkSession, sfDir: String): DataFrame = {
    val store = scratch(spark)
    seedRegions(store, sfDir)
    new CypherWriter(store).execute(
      """MATCH (r:Region)
         CREATE (s:Summary {identifier: r.identifier, score: r.regionkey * 10})
         CREATE (r)-[:REGION_HAS_SUMMARY]->(s)""")
    val rels = store.rel("REGION_HAS_SUMMARY")
    val s = store.node("Summary")
    rels.join(s, rels("dst") === s("identifier"))
      .select(col("src").as("region"), col("score"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w01_merge_upsert" -> (w01MergeUpsert(_, _)),
    "w02_set_map" -> (w02SetMap(_, _)),
    "w03_detach_delete" -> (w03DetachDelete(_, _)),
    "w04_match_create" -> (w04MatchCreate(_, _)))

  /** DuckDB replay of each gate's end state over the original parquet. */
  val oracle: Map[String, String] = Map(
    "w01_merge_upsert" ->
      """SELECT n_name AS identifier,
                CAST(CASE WHEN n_name = 'NATION_3' THEN 9 ELSE n_regionkey END AS BIGINT) AS regionkey,
                CAST(NULL AS VARCHAR) AS status
         FROM nation
         UNION ALL
         SELECT 'ZEALANDIA', 9, 'new'""",
    "w02_set_map" ->
      """SELECT n_name AS identifier,
                CAST(CASE WHEN n_regionkey = 2 THEN 12 ELSE n_regionkey END AS BIGINT) AS regionkey,
                CASE WHEN n_regionkey IN (0, 1) THEN 'amended' ELSE NULL END AS status
         FROM nation""",
    "w03_detach_delete" ->
      """SELECT n_name AS identifier,
                CAST(n_regionkey AS BIGINT) AS regionkey,
                r_name AS region
         FROM nation JOIN region ON n_regionkey = r_regionkey
         WHERE n_regionkey <> 0""",
    "w04_match_create" ->
      """SELECT r_name AS region,
                CAST(r_regionkey * 10 AS BIGINT) AS score
         FROM region""")
}
