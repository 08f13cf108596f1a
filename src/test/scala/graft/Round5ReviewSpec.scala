package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.fixtures.SecFixture
import graft.query.cypher.{CypherCompiler, CypherWriter}
import graft.sources.TpchGraph

/** Round-5 review findings, pinned. Each test is the failure scenario
  * the review identified, asserted fixed. */
class Round5ReviewSpec extends SparkTestBase {

  private lazy val store = SecFixture.ingest(
    spark, Files.createTempDirectory("graft-r5rev").toString, "r5rev")

  test("EXISTS with BOTH endpoints bound tests the specific pair, not any-rel") {
    // rep_a_10k's facts are linked to it; rep_m_10k's are not. With the
    // pre-fix compile both queries returned the same (anchor-only) set.
    val linked = new CypherCompiler(store).run(
      """MATCH (r:Report {identifier: 'rep_a_10k'}), (f:Fact)
         WHERE EXISTS((r)-[:REPORT_HAS_FACT]->(f))
         RETURN count(f) AS n""").collect()(0).getLong(0)
    assert(linked === 100L) // 25 elements x 4 quarters
    val crossPair = new CypherCompiler(store).run(
      """MATCH (r:Report {identifier: 'rep_a_10k'}), (f:Fact)
         WHERE EXISTS((r)-[:REPORT_HAS_FACT]->(f)) AND f.identifier = 'fact_rep_m_10k_0_0'
         RETURN count(f) AS n""").collect()(0).getLong(0)
    assert(crossPair === 0L, "a foreign report's fact must not satisfy the pair EXISTS")
  }

  test("EXISTS on a label-less anchor constrains the label, not just the key string") {
    // TPC-H keys collide across labels (customer 1 / supplier 1 /
    // nation 1 all stringify to "1"): without the label guard a
    // label-less EXISTS((n)-[:CUSTOMER_PLACED_ORDER]->()) would keep
    // suppliers/nations whose key strings collide with customer keys.
    val g = new TpchGraph(spark, sfDir)
    val rows = new CypherCompiler(g).run(
      """MATCH (n)
         WHERE EXISTS((n)-[:CUSTOMER_PLACED_ORDER]->(o:Order))
         RETURN label(n) AS lbl, count(n) AS cnt ORDER BY lbl""").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("Customer"),
      s"only customers place orders, got ${rows.mkString(",")}")
  }

  test("a later SET clause reads the earlier clause's assignment (openCypher)") {
    val st2 = store.fork("r5rev-chain")
    new CypherWriter(st2).execute(
      """MATCH (c:Entity {identifier: 'ent_apple'})
         SET c.cik = '424242'
         SET c.status = c.cik""")
    val row = st2.node("Entity")
      .filter(col("identifier") === "ent_apple").collect()(0)
    assert(row.getAs[String]("status") === "424242",
      "chained SET must see the new cik, not the pre-write value")
  }

  test("write-statement RETURN honors ORDER BY + SKIP/LIMIT") {
    val st2 = store.fork("r5rev-limit")
    val out = new CypherWriter(st2).execute(
      """MATCH (f:Fact)
         SET f.fact_type = 'Checked'
         RETURN f.identifier AS id ORDER BY id LIMIT 3""").collect()
    assert(out.length === 3)
    assert(out.map(_.getString(0)).toSeq === out.map(_.getString(0)).toSeq.sorted)
  }

  test("CREATE re-declaring a bound variable with label/props fails loudly") {
    val st2 = store.fork("r5rev-rebind")
    val ex = intercept[IllegalArgumentException] {
      new CypherWriter(st2).execute(
        """MATCH (r:Report {identifier: 'rep_a_10k'})
           CREATE (r:Fact {identifier: 'f9', value: '1'})""")
    }
    assert(ex.getMessage.contains("re-declare"))
    assert(st2.node("Fact").filter(col("identifier") === "f9").isEmpty)
  }

  test("DETACH DELETE with zero matches touches no tables") {
    val st2 = store.fork("r5rev-noop")
    val factDir = new java.io.File(st2.nodePath("Fact"))
    val before = factDir.lastModified()
    Thread.sleep(5)
    val summary = new CypherWriter(st2, Map("id" -> "does_not_exist"))
      .execute("MATCH (t:Fact {identifier: $id}) DETACH DELETE t").collect()(0)
    assert(summary.getAs[Long]("nodesDeleted") === 0L)
    assert(factDir.lastModified() === before, "no-op delete must not rewrite the table")
  }

  test("UNION containing a write statement gets the right error") {
    val ex = intercept[IllegalArgumentException] {
      new CypherWriter(store).execute(
        """MATCH (n:Entity) SET n.status = 'x' RETURN n.identifier AS id
           UNION ALL
           MATCH (m:Entity) RETURN m.identifier AS id""")
    }
    assert(ex.getMessage.contains("UNION of write statements"))
  }
}
