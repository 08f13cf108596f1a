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

  test("SegmentIdRange: orderings, unions, and the never-invent-a-skip rule") {
    import graft.storage.SegmentIdRange
    val dir = java.nio.file.Files.createTempDirectory("graft-idrange").toFile
    // string ordering is UTF8String BINARY order, not Java compareTo:
    // U+FF61 (EF BD A1 in UTF-8) sorts above U+10000 (F0 90 80 80) in
    // UTF-16 code units but BELOW it in UTF-8 bytes — Spark's min/max
    // produced the bounds in byte order, so the sidecar must compare
    // the same way or a skip could lose a real match
    val lo = "｡"          // 3-byte UTF-8
    val hi = new String(Character.toChars(0x10000)) // 4-byte UTF-8
    assert(lo.compareTo(hi) > 0, "fixture: Java order disagrees with UTF-8")
    val seg = SegmentIdRange.of("string", "a", lo)
    assert(!SegmentIdRange.mayOverlap(seg, SegmentIdRange.of("string", hi, hi)),
      "hi sorts past the segment max in UTF-8 byte order — skippable")
    assert(SegmentIdRange.mayOverlap(seg, SegmentIdRange.of("string", lo, hi)))
    // file roundtrip with a newline-bearing string id (base64 carries it)
    val tricky = SegmentIdRange.of("string", "a\nb", "z\nq")
    SegmentIdRange.write(dir, tricky)
    assert(SegmentIdRange.read(dir) === tricky)
    // a CORRUPT sidecar degrades to always-scan, never a crash (the
    // file is advisory — a takedown must not die on a bad hint)
    java.nio.file.Files.write(
      new java.io.File(dir, SegmentIdRange.FileName).toPath,
      "long\n!!!not-base64!!!\nzzz\n".getBytes("UTF-8"))
    assert(SegmentIdRange.read(dir) === None)
    // unknown/absent/mismatched-type ranges must never invent a skip
    assert(SegmentIdRange.mayOverlap(None, SegmentIdRange.of("long", 1L, 2L)))
    assert(SegmentIdRange.mayOverlap(SegmentIdRange.of("long", 1L, 2L), None))
    assert(SegmentIdRange.mayOverlap(
      SegmentIdRange.of("string", "1", "2"), SegmentIdRange.of("long", 9L, 9L)))
    assert(SegmentIdRange.of("array<int>", 1, 2) === None,
      "uncomparable types write nothing (= never prune)")
    assert(SegmentIdRange.of("long", null, 5L) === None,
      "null aggregate (empty frame) writes nothing")
    // unions: conservative, type-checked
    assert(SegmentIdRange.union(
      SegmentIdRange.of("long", 1L, 5L), SegmentIdRange.of("long", 3L, 9L))
      === SegmentIdRange.of("long", 1L, 9L))
    assert(SegmentIdRange.union(
      SegmentIdRange.of("long", 1L, 5L), None) === None)
    assert(SegmentIdRange.union(
      SegmentIdRange.of("long", 1L, 5L),
      SegmentIdRange.of("string", "1", "5")) === None)
    // numeric pruning: disjoint skips, touching endpoints do not
    assert(!SegmentIdRange.mayOverlap(
      SegmentIdRange.of("long", 1L, 5L), SegmentIdRange.of("long", 6L, 9L)))
    assert(SegmentIdRange.mayOverlap(
      SegmentIdRange.of("long", 1L, 5L), SegmentIdRange.of("long", 5L, 9L)))
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
    // an EXACT-host entry matches however deep the host (the chain's
    // full-host row — the review finding: the bound must not hide a
    // listed crafted host)
    val deepHost = (1 to 9).map(i => s"l$i").mkString(".") + ".evil.com"
    val docs2 = Seq((9L, s"https://$deepHost/x")).toDF("doc_id", "url")
    assert(CurationPipeline.urlDomainFilter(
      docs2, "doc_id", "url",
      Seq(deepHost).toDF("domain"), "domain", maxLabels = 8).count() === 0L,
      "exact-host blocklist entry must match a deeper-than-bound host")
    // the documented trade: a PROPER suffix deeper than the bound
    // (here the host's last 9 labels, not the full 11-label host)
    // sits outside the chain and cannot match
    val deepSuffix = (2 to 9).map(i => s"l$i").mkString(".") + ".evil.com"
    assert(deepSuffix != deepHost && deepHost.endsWith("." + deepSuffix))
    assert(CurationPipeline.urlDomainFilter(
      docs2, "doc_id", "url",
      Seq(deepSuffix).toDF("domain"), "domain", maxLabels = 8).count() === 1L,
      "a 10-label proper suffix sits outside the 8-label chain (the documented bound)")
    // and any suffix within the bound still catches it
    val out3 = CurationPipeline.urlDomainFilter(
      docs2, "doc_id", "url",
      Seq("evil.com").toDF("domain"), "domain", maxLabels = 8)
    assert(out3.count() === 0L)
  }
}
