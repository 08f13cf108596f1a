package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.fixtures.AccountingFixture
import graft.operators.{Dedup, SkewJoin}
import graft.query.cypher.{CypherCompiler, CypherParser}

/** Regressions for the third self-review pass (query/etl/views/ops). */
class Review3RegressionSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val store = AccountingFixture.ingest(
    spark, Files.createTempDirectory("graft-r3").toString, "r3")
  private def run(q: String) = new CypherCompiler(store).run(q)

  test("WITH node alias: WITH t AS txn RETURN txn.prop resolves") {
    val df = run(
      """MATCH (t:Transaction)
         WITH t AS txn
         RETURN txn.identifier AS id ORDER BY id LIMIT 2""")
    assert(df.collect().map(_.getString(0)).toSeq === Seq("txn001", "txn002"))
  }

  test("ORDER BY node property after aggregation over expanded node var") {
    val df = run(
      """MATCH (e:Entity)-[:ENTITY_HAS_TRANSACTION]->(t:Transaction)
         RETURN e, count(t) AS n ORDER BY e.identifier""")
    assert(df.count() === 1)
    assert(df.columns.contains("e.identifier"))
  }

  test("sum(DISTINCT) deduplicates values") {
    // line items repeat debit amounts (debit row + zero rows): compare
    // against the independently computed distinct-value sum
    val df = run(
      """MATCH (li:LineItem)
         RETURN sum(DISTINCT li.debit_amount) AS s, sum(li.debit_amount) AS total""")
    val r = df.collect()(0)
    val expectDistinct = store.node("LineItem")
      .select(col("debit_amount")).distinct()
      .agg(sum(col("debit_amount"))).collect()(0).getDouble(0)
    assert(math.abs(r.getAs[Double]("s") - expectDistinct) < 1e-9)
    // and DISTINCT actually collapsed rows (60 zero-amount credit lines)
    val counts = run(
      """MATCH (li:LineItem)
         RETURN count(DISTINCT li.debit_amount) AS d, count(li.debit_amount) AS n""")
      .collect()(0)
    assert(counts.getAs[Long]("d") < counts.getAs[Long]("n"))
  }

  test("inline props on anonymous optional node still filter") {
    val all = run(
      """MATCH (t:Transaction)
         OPTIONAL MATCH (t)-[:TRANSACTION_HAS_LINE_ITEM]->(li:LineItem)
         RETURN count(li) AS n""").collect()(0).getAs[Long]("n")
    val filtered = run(
      """MATCH (t:Transaction)
         OPTIONAL MATCH (t)-[:TRANSACTION_HAS_LINE_ITEM]->({debit_amount: 0.0})
         RETURN count(t) AS n""")
    // anonymous-node prop map must constrain matches (credit lines only)
    assert(all === 120L)
    val n = filtered.collect()(0).getAs[Long]("n")
    assert(n === 60L, s"anonymous prop filter ignored: $n")
  }

  test("UNION with trailing ORDER BY/LIMIT applies to the whole union") {
    val df = run(
      """MATCH (t:Transaction) RETURN t.identifier AS id
         UNION ALL
         MATCH (li:LineItem) RETURN li.identifier AS id
         ORDER BY id DESC LIMIT 3""")
    val ids = df.collect().map(_.getString(0))
    assert(ids.length === 3)
    // global descending order across BOTH branches: the top id is a
    // LineItem suffix of the max transaction (txn510_d), which only
    // appears if ORDER BY applied to the union, not the last branch
    assert(ids.toSeq === ids.sorted.reverse.toSeq)
    assert(ids(0) === "txn510_d")
  }

  test("MATCH after WITH parses (round-5 upgrade of the old Left-pin)") {
    // this test originally pinned that MATCH-after-WITH fails as a
    // graceful Left; the clause-ordering generalization (save_view.py's
    // count-then-rematch statement) made it a supported segment, so the
    // pin upgrades to: parses as one query with both clauses
    val r = CypherParser.parseQuery(
      "MATCH (a:Entity) WITH a MATCH (b:Transaction) RETURN a.identifier AS x")
    assert(r.isRight)
    assert(r.toOption.get.branches.head.matches.length === 2)
  }

  test("exact dedup content hash is column-boundary and null safe") {
    val df = Seq((1L, "ab", "c"), (2L, "a", "bc"), (3L, "x", null), (4L, "x", ""))
      .toDF("id", "t1", "t2")
    val kept = Dedup.exactDedup(df, "id", Seq("t1", "t2"))
    assert(kept.count() === 4) // no false collisions
    val groups = Dedup.exactGroups(df, "id", Seq("t1", "t2"))
    assert(groups.count() === 0)
  }

  test("salted join rejects right/full outer") {
    val d = Seq((1, "a")).toDF("k", "v")
    assertThrows[IllegalArgumentException] {
      SkewJoin.saltedJoin(d, "k", d.withColumnRenamed("k", "k2"), "k2",
        joinType = "full_outer")
    }
  }

  test("leftward var-length traverses reversed edges") {
    // ENTITY_OWNS_ENTITY: parent -> child; build a tiny chain
    store.ingestRels("ENTITY_OWNS_ENTITY",
      Seq(("ent1", "entChild")).toDF("from", "to"), Some("own1"))
    store.ingestNodes("Entity",
      Seq(("entChild", "Child Co")).toDF("identifier", "name"), Some("own1"),
      ignoreErrors = true)
    val down = run(
      """MATCH (a:Entity {identifier: 'ent1'})-[:ENTITY_OWNS_ENTITY*1..2]->(b:Entity)
         RETURN b.identifier AS id""").collect().map(_.getString(0))
    val up = run(
      """MATCH (a:Entity {identifier: 'entChild'})<-[:ENTITY_OWNS_ENTITY*1..2]-(b:Entity)
         RETURN b.identifier AS id""").collect().map(_.getString(0))
    assert(down.toSeq === Seq("entChild"))
    assert(up.toSeq === Seq("ent1"))
  }
}
