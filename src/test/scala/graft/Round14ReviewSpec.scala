package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.CurationPipeline

/** Round-14 review items: the urlDomainFilter whale-host pre-cap must
  * be invisible in results (only the wall changes), and the maxLabels
  * bound must cap a crafted host's suffix explosion without losing
  * real blocklist matches. */
class Round14ReviewSpec extends SparkTestBase {
  import spark.implicits._

  private def collectAll(df: DataFrame): Seq[(Long, String, Int)] =
    df.select(col("doc_id"), col("domain"), col("domain_rank"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .toSeq.sortBy(t => (t._2, t._1))

  test("the per-domain cap runs a PARTIAL WindowGroupLimit below the exchange (whale-host pre-cap)") {
    val rnd = new scala.util.Random(11)
    // one whale host with 300 rows, a dozen small hosts, some blocked
    val docs = (0 until 400).map { i =>
      val host =
        if (i < 300) "whale.example.com"
        else if (i % 3 == 0) "ads.tracker.io"
        else s"s${rnd.nextInt(12)}.ok.org"
      (i.toLong, s"https://$host/p/$i")
    }.toDF("doc_id", "url")
    val block = Seq("tracker.io").toDF("domain")
    for (cap <- Seq(1, 5, 50)) {
      val out = CurationPipeline.urlDomainFilter(
        docs, "doc_id", "url", block, "domain", maxPerDomain = cap)
      val plain = collectAll(out)
      // the blocked host is gone, the whale is capped
      assert(plain.count(_._2 == "ads.tracker.io") === 0)
      assert(plain.count(_._2 == "whale.example.com") === math.min(cap, 300))
      // the whale-host pre-cap is Catalyst's rank-limit pushdown: a
      // Partial WindowGroupLimit in the map stage keeps ≤ cap rows per
      // host per task BEFORE the shuffle — pin it so a regression (a
      // changed filter shape, a non-literal cap) surfaces here, not in
      // a 100 TB crawl's one stuck task
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains(s"WindowGroupLimit [domain"), plan)
      assert(plan.matches(s"(?s).*WindowGroupLimit \\[domain[^\\n]*$cap, Partial.*"),
        s"no PARTIAL group limit at cap=$cap:\n$plan")
    }
  }

  test("maxLabels caps a crafted thousand-label host's suffix chain, keeping real matches") {
    val crafted = (1 to 1000).map(i => s"l$i").mkString(".") + ".evil.com"
    val docs = Seq(
      (1L, s"https://$crafted/x"),            // blocked via its last labels
      (2L, "https://" + "fine.example.org/y"),
      (3L, "https://" + "sub.evil.com/z")     // blocked normally
    ).toDF("doc_id", "url")
    val block = Seq("evil.com").toDF("domain")
    val out = CurationPipeline.urlDomainFilter(
      docs, "doc_id", "url", block, "domain", maxLabels = 8)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet === Set(2L))
    // the explosion is bounded: the suffix chain of ANY host is at
    // most maxLabels rows — observable through a blocklist entry
    // deeper than the bound, which (documented trade) cannot match
    val deepEntry = (1 to 9).map(i => s"l$i").mkString(".") + ".evil.com"
    val deepHost = (1 to 9).map(i => s"l$i").mkString(".") + ".evil.com"
    val docs2 = Seq((9L, s"https://$deepHost/x")).toDF("doc_id", "url")
    val out2 = CurationPipeline.urlDomainFilter(
      docs2, "doc_id", "url",
      Seq(deepEntry).toDF("domain"), "domain", maxLabels = 8)
    assert(out2.count() === 1L,
      "an 11-label blocklist entry sits outside the 8-label chain (the documented bound)")
    // but the same host IS caught by any suffix within the bound
    val out3 = CurationPipeline.urlDomainFilter(
      docs2, "doc_id", "url",
      Seq("evil.com").toDF("domain"), "domain", maxLabels = 8)
    assert(out3.count() === 0L)
  }
}
