package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.fixtures.SecFixture
import graft.query.cypher.{CypherCompiler, CypherWriter}

/** Cypher WRITE statements end-to-end against a GraphStore — the text
  * forms the reference's write path actually emits:
  * connection_service.py (SET status / DETACH DELETE),
  * sec_provider.py (SET c.cik = $cik / SET c.cik = null),
  * plaid transactions.py (DELETE t RETURN count(t)),
  * save_view.py (MATCH anchors + CREATE fact + rels),
  * tests/middleware/mcp/test_client.py (REMOVE n.property). */
class CypherWriteSpec extends SparkTestBase {

  private lazy val store = SecFixture.ingest(
    spark, Files.createTempDirectory("graft-write").toString, "write")

  private def writer(params: Map[String, Any] = Map.empty) =
    new CypherWriter(store, params)
  private def read(q: String) = new CypherCompiler(store).run(q)

  test("SET props with params and RETURN reflects the updated values") {
    val out = writer(Map("entity_id" -> "ent_apple", "cik" -> "999"))
      .execute(
        """MATCH (c:Entity {identifier: $entity_id})
           SET c.cik = $cik, c.status = 'error'
           RETURN c.identifier AS identifier, c.cik AS cik""")
      .collect()
    assert(out.length === 1)
    assert(out(0).getString(1) === "999")
    // persisted: re-read through the store
    val row = store.node("Entity")
      .filter(col("identifier") === "ent_apple").collect()(0)
    assert(row.getAs[String]("cik") === "999")
    assert(row.getAs[String]("status") === "error")
    // the other entity is untouched
    val other = store.node("Entity")
      .filter(col("identifier") === "ent_msft").collect()(0)
    assert(other.getAs[String]("cik") === "0000789019")
  }

  test("SET to null (sec_provider clear-cik) and REMOVE behave alike") {
    writer(Map("entity_id" -> "ent_apple")).execute(
      """MATCH (c:Entity {identifier: $entity_id})
         SET c.cik = null
         RETURN c.identifier AS identifier""")
    assert(store.node("Entity").filter(col("identifier") === "ent_apple")
      .collect()(0).getAs[String]("cik") === null)
    writer().execute(
      "MATCH (c:Entity {identifier: 'ent_apple'}) REMOVE c.status")
    assert(store.node("Entity").filter(col("identifier") === "ent_apple")
      .collect()(0).getAs[String]("status") === null)
  }

  test("DELETE on an attached node fails loudly; DETACH DELETE removes subtree rels") {
    val st2 = store.fork("write-del")
    val w = new CypherWriter(st2)
    val ex = intercept[IllegalStateException] {
      w.execute("MATCH (r:Report {identifier: 'rep_a_10q'}) DELETE r")
    }
    assert(ex.getMessage.contains("DETACH"))
    val before = st2.rel("ENTITY_HAS_REPORT").count()
    val summary = w.execute(
      "MATCH (r:Report {identifier: 'rep_a_10q'}) DETACH DELETE r").collect()(0)
    assert(summary.getAs[Long]("nodesDeleted") === 1L)
    assert(st2.node("Report").filter(col("identifier") === "rep_a_10q").isEmpty)
    // its ENTITY_HAS_REPORT + REPORT_HAS_FACT rows are gone; others intact
    assert(st2.rel("ENTITY_HAS_REPORT").count() === before - 1)
    assert(st2.rel("ENTITY_HAS_REPORT")
      .filter(col("dst") === "rep_a_10q").isEmpty)
    assert(st2.rel("REPORT_HAS_FACT")
      .filter(col("src") === "rep_a_10q").isEmpty)
    assert(st2.node("Report").count() === 3)
  }

  test("DELETE t RETURN count(t) evaluates over the pre-delete match (plaid shape)") {
    val st2 = store.fork("write-del2")
    // facts have rel rows, so detach; count comes from the match
    val out = new CypherWriter(st2, Map("identifier" -> "fact_rep_m_10k_3_1"))
      .execute(
        """MATCH (t:Fact {identifier: $identifier})
           DETACH DELETE t
           RETURN count(t) as deleted_count""").collect()
    assert(out(0).getLong(0) === 1L)
    assert(st2.node("Fact").filter(col("identifier") === "fact_rep_m_10k_3_1").isEmpty)
  }

  test("MATCH anchors + CREATE fact and rels (save_view statement shape)") {
    val st2 = store.fork("write-create")
    val w = new CypherWriter(st2, Map(
      "report_id" -> "rep_a_10k", "element_id" -> "elem_2",
      "fact_id" -> "fact_new_1"))
    val summary = w.execute(
      """MATCH (r:Report {identifier: $report_id})
         MATCH (e:Element {identifier: $element_id})
         CREATE (f:Fact {identifier: $fact_id, value: '42',
                         numeric_value: 42.0, fact_type: 'Numeric'})
         CREATE (r)-[:REPORT_HAS_FACT]->(f), (f)-[:FACT_HAS_ELEMENT]->(e)""")
      .collect()(0)
    assert(summary.getAs[Long]("nodesCreated") === 1L)
    assert(summary.getAs[Long]("relsCreated") === 2L)
    // readable back through the full Cypher read path
    val got = new CypherCompiler(st2, Map("fid" -> "fact_new_1")).run(
      """MATCH (r:Report)-[:REPORT_HAS_FACT]->(f:Fact {identifier: $fid})
               -[:FACT_HAS_ELEMENT]->(e:Element)
         RETURN r.identifier AS rid, f.numeric_value AS v, e.identifier AS eid""")
      .collect()
    assert(got.length === 1)
    assert(got(0).getString(0) === "rep_a_10k")
    assert(got(0).getDouble(1) === 42.0)
    assert(got(0).getString(2) === "elem_2")
  }

  test("CREATE rejects a missing primary key and duplicate keys fail strict ingest") {
    val st2 = store.fork("write-strict")
    val w = new CypherWriter(st2)
    val ex = intercept[IllegalArgumentException] {
      w.execute("CREATE (f:Fact {value: 'x'})")
    }
    assert(ex.getMessage.contains("primary key"))
    val dup = intercept[IllegalArgumentException] {
      w.execute("CREATE (f:Fact {identifier: 'fact_rep_a_10k_0_0', value: 'x'})")
    }
    assert(dup.getMessage.toLowerCase.contains("duplicate"))
  }

  test("read-only compiler refuses write statements with a pointer to the writer") {
    val ex = intercept[IllegalArgumentException] {
      read("MATCH (n:Entity) DETACH DELETE n")
    }
    assert(ex.getMessage.contains("CypherWriter"))
  }

  test("writer passes reads through to the compiler") {
    val out = writer().execute(
      "MATCH (e:Entity) RETURN count(e) AS n").collect()
    assert(out(0).getLong(0) === 2L)
  }

  test("MERGE node upsert then SET then RETURN (plaid transactions.py shape)") {
    val st2 = store.fork("write-merge")
    val w = new CypherWriter(st2, Map(
      "identifier" -> "fact_merge_1", "amount" -> 77.5))
    // first MERGE creates
    val out1 = w.execute(
      """MERGE (t:Fact {identifier: $identifier})
         SET t.numeric_value = $amount, t.fact_type = 'Numeric'
         RETURN t.identifier AS id, t.numeric_value AS v""").collect()
    assert(out1.length === 1)
    assert(out1(0).getString(0) === "fact_merge_1")
    assert(out1(0).getDouble(1) === 77.5)
    val before = st2.node("Fact").count()
    // second MERGE matches (no duplicate), SET updates
    val w2 = new CypherWriter(st2, Map(
      "identifier" -> "fact_merge_1", "amount" -> 99.0))
    val out2 = w2.execute(
      """MERGE (t:Fact {identifier: $identifier})
         SET t.numeric_value = $amount
         RETURN t.identifier AS id, t.numeric_value AS v""").collect()
    assert(out2(0).getDouble(1) === 99.0)
    assert(st2.node("Fact").count() === before) // upsert, not insert
  }

  test("MERGE relationship between matched anchors is idempotent (connection_service shape)") {
    val st2 = store.fork("write-merge-rel")
    val w = new CypherWriter(st2, Map(
      "entity_id" -> "ent_apple", "report_id" -> "rep_m_10k"))
    val stmt =
      """MATCH (c:Entity {identifier: $entity_id})
         MATCH (r:Report {identifier: $report_id})
         MERGE (c)-[:ENTITY_HAS_REPORT]->(r)"""
    val s1 = w.execute(stmt).collect()(0)
    assert(s1.getAs[Long]("relsCreated") === 1L)
    val before = st2.rel("ENTITY_HAS_REPORT").count()
    val s2 = new CypherWriter(st2, Map(
      "entity_id" -> "ent_apple", "report_id" -> "rep_m_10k")).execute(stmt).collect()(0)
    assert(s2.getAs[Long]("relsCreated") === 0L)
    assert(st2.rel("ENTITY_HAS_REPORT").count() === before)
  }

  test("label-less DETACH DELETE empties the graph (test_client's MATCH (n) DELETE n)") {
    val st2 = store.fork("write-wipe")
    val summary = new CypherWriter(st2)
      .execute("MATCH (n) DETACH DELETE n").collect()(0)
    assert(summary.getAs[Long]("nodesDeleted") > 0L)
    st2.schema.nodes.foreach { nd =>
      assert(st2.node(nd.name).isEmpty, s"${nd.name} not emptied")
    }
    st2.schema.rels.foreach { rd =>
      assert(st2.rel(rd.name).isEmpty, s"${rd.name} rels not emptied")
    }
  }
}
