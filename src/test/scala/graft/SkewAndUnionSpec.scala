package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.fixtures.AccountingFixture
import graft.operators.SkewJoin
import graft.query.cypher.CypherCompiler

class SkewAndUnionSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join returns the same rows as a plain join") {
    val large = (1 to 10000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("k", "v")
    val small = Seq(("hot", "H"), ("k5", "F")).toDF("k2", "tag")
    val plain = large.join(small, large("k") === small("k2")).count()
    val salted = SkewJoin.saltedJoin(large, "k", small, "k2", factor = 4).count()
    assert(salted === plain)
    assert(salted === 1001)
  }

  test("keySkew surfaces the heavy hitter") {
    val df = (1 to 1000).map(i => (if (i % 2 == 0) "hot" else s"k$i", i)).toDF("k", "v")
    val top = SkewJoin.keySkew(df, "k", 1).collect()(0)
    assert(top.getString(0) === "hot" && top.getLong(1) === 500L)
  }

  test("cypher UNION ALL of per-label counts (example_queries_tool shape)") {
    val root = Files.createTempDirectory("graft-union").toString
    val store = AccountingFixture.ingest(spark, root, "un")
    val df = new CypherCompiler(store).run(
      """MATCH (t:Transaction) RETURN 'Transaction' AS label, count(t) AS n
         UNION ALL
         MATCH (li:LineItem) RETURN 'LineItem' AS label, count(li) AS n
         UNION ALL
         MATCH (e:Element) RETURN 'Element' AS label, count(e) AS n""")
    val rows = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows === Map("Transaction" -> 60L, "LineItem" -> 120L, "Element" -> 18L))
  }
}
