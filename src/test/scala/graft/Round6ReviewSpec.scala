package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.fixtures.SecFixture
import graft.query.cypher.{CypherCompiler, CypherWriter}

/** Round-6 review fixes pinned:
  *  - EXISTS far-node selection by ANCHOR position (leftward patterns
  *    validated the anchor against the far schema label and never
  *    checked the real far node);
  *  - CREATE of a fresh unlabeled node fails loudly (was a silent
  *    no-op reporting nodesCreated=0);
  *  - SET is simultaneous within a clause: RETURN matches the
  *    persisted swap (was a sequential overlay fold);
  *  - updateNodeProps returns the MATCHED key count (was distinct
  *    requested keys — absent keys overreported propertiesSet);
  *  - MERGE match maps beyond the primary key are rejected loudly
  *    (was a silent key-only match);
  *  - write RETURN above a row threshold pages through a staging
  *    parquet instead of a full driver collect. */
class Round6ReviewSpec extends SparkTestBase {

  private lazy val store = SecFixture.ingest(
    spark, Files.createTempDirectory("graft-r6").toString, "r6")

  private def read(q: String) = new CypherCompiler(store).run(q)

  test("leftward EXISTS with head-bound anchor runs and validates the real far node") {
    // (r)<-[:ENTITY_HAS_REPORT]-(e:Entity): anchor r is the dst; the
    // far node is e — its Entity label must validate against the
    // schema's SOURCE side, not the anchor's
    val n = read(
      """MATCH (r:Report)
         WHERE EXISTS((r)<-[:ENTITY_HAS_REPORT]-(e:Entity))
         RETURN count(r) AS n""").collect()(0).getLong(0)
    assert(n === store.rel("ENTITY_HAS_REPORT").select("dst").distinct().count())
    // a WRONG far label is rejected loudly, never silently unchecked
    val ex = intercept[IllegalArgumentException] {
      read("""MATCH (r:Report)
              WHERE EXISTS((r)<-[:ENTITY_HAS_REPORT]-(x:Report))
              RETURN count(r) AS n""")
    }
    assert(ex.getMessage.contains("far label"))
  }

  test("leftward EXISTS with far-bound anchor (anchor on the arrow's source side)") {
    val rows = read(
      """MATCH (e:Entity)
         WHERE EXISTS((x:Report)<-[:ENTITY_HAS_REPORT]-(e))
         RETURN e.identifier AS id ORDER BY id""").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("ent_apple", "ent_msft"))
    // NOT EXISTS complements to zero on the same anchor set
    val none = read(
      """MATCH (e:Entity)
         WHERE NOT EXISTS((x:Report)<-[:ENTITY_HAS_REPORT]-(e))
         RETURN count(e) AS n""").collect()(0).getLong(0)
    assert(none === 0L)
  }

  test("CREATE of a fresh unlabeled node fails loudly, never a silent no-op") {
    val st2 = store.fork("r6-create")
    val ex = intercept[IllegalArgumentException] {
      new CypherWriter(st2).execute("CREATE (f {identifier: 'x'})")
    }
    assert(ex.getMessage.contains("needs a label"))
  }

  test("SET swap within one clause: persisted AND returned values both swap") {
    val st2 = store.fork("r6-swap")
    val out = new CypherWriter(st2).execute(
      """MATCH (c:Entity {identifier: 'ent_apple'})
         SET c.cik = c.status, c.status = c.cik
         RETURN c.cik AS cik, c.status AS status""").collect()(0)
    assert(out.getString(0) === "active")
    assert(out.getString(1) === "0000320193")
    val row = st2.node("Entity")
      .filter(col("identifier") === "ent_apple").collect()(0)
    assert(row.getAs[String]("cik") === "active")
    assert(row.getAs[String]("status") === "0000320193")
  }

  test("updateNodeProps counts only keys that matched a stored row") {
    import spark.implicits._
    val st2 = store.fork("r6-count")
    val updates = Seq(("ent_apple", "probe"), ("ent_missing", "probe"))
      .toDF("__key", "status")
    assert(st2.updateNodeProps("Entity", updates) === 1L)
  }

  test("MERGE match maps beyond the primary key are rejected loudly") {
    val st2 = store.fork("r6-merge")
    val ex = intercept[IllegalArgumentException] {
      new CypherWriter(st2).execute(
        "MERGE (t:Fact {identifier: 'fact_rep_a_10k_0_0', value: 'zzz'})")
    }
    assert(ex.getMessage.contains("primary key only"))
  }

  test("SET += merges a param map: null removes, absent keeps, pk skipped (neo4j dialect)") {
    val st2 = store.fork("r6-setmerge")
    val out = new CypherWriter(st2, Map(
      "id" -> "ent_apple",
      "props" -> Map(
        "identifier" -> "ent_apple", // pk: anchored by MATCH, never reassigned
        "status" -> "merged",
        "ticker" -> null))) // openCypher +=: null value removes
      .execute(
        """MATCH (c:Entity {identifier: $id})
           SET c += $props
           RETURN c.status AS status, c.ticker AS ticker, c.name AS name""")
      .collect()(0)
    assert(out.getString(0) === "merged")
    assert(out.getString(1) === null)
    assert(out.getString(2) === "Apple Inc.") // absent key keeps its value
    val row = st2.node("Entity")
      .filter(col("identifier") === "ent_apple").collect()(0)
    assert(row.getAs[String]("status") === "merged")
    assert(row.getAs[String]("ticker") === null)
    assert(row.getAs[String]("name") === "Apple Inc.")
    // literal-map form, mixed with a plain assignment in one clause
    val out2 = new CypherWriter(st2).execute(
      """MATCH (c:Entity {identifier: 'ent_msft'})
         SET c.cik = '42', c += {status: 'ok'}
         RETURN c.status AS status, c.cik AS cik""").collect()(0)
    assert(out2.getString(0) === "ok")
    assert(out2.getString(1) === "42")
    // a non-map expression is rejected loudly
    val ex = intercept[IllegalArgumentException] {
      new CypherWriter(st2).execute(
        "MATCH (c:Entity {identifier: 'ent_msft'}) SET c += c.status")
    }
    assert(ex.getMessage.contains("SET +="))
  }

  test("write RETURN above the threshold pages through staging parquet, ordered") {
    val st2 = store.fork("r6-page")
    val out = new CypherWriter(st2, returnCollectThreshold = 0)
      .execute(
        """MATCH (f:Fact)
           SET f.fact_type = 'Paged'
           RETURN f.identifier AS id ORDER BY id""")
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.toLowerCase.contains("parquet"),
      s"expected a lazy parquet-backed result, got:\n$plan")
    val ids = out.collect().map(_.getString(0))
    assert(ids.nonEmpty)
    assert(ids.toSeq === ids.sorted.toSeq, "staged result lost its ORDER BY")
    assert(st2.node("Fact").filter(col("fact_type") =!= lit("Paged")).isEmpty)
    // small results still collect to a LocalRelation (no staging dir)
    val small = new CypherWriter(st2).execute(
      """MATCH (c:Entity {identifier: 'ent_apple'})
         SET c.status = 'ok' RETURN c.identifier AS id""")
    assert(small.queryExecution.optimizedPlan.toString.contains("LocalRelation"))
  }
}
