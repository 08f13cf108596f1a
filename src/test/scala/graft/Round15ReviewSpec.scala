package graft

import org.apache.spark.sql.functions._
import graft.operators.CurationPipeline
import graft.storage.IvfIndex

/** Round-15 review items: the UNCAPPED urlDomainFilter call must not
  * pay the per-host window (VERDICT r14 wrong #2), drift() must offer
  * the sampling knob its own scaladoc promises (missing #3), and an
  * oversized `_idbloom` sidecar must degrade to scan without being
  * slurped into driver memory (ADVICE r14). */
class Round15ReviewSpec extends SparkTestBase {
  import spark.implicits._

  test("uncapped urlDomainFilter skips the per-host window: no Window, no extra Exchange") {
    val docs = (0 until 200).map { i =>
      val host = if (i % 3 == 0) "ads.tracker.io" else s"s${i % 7}.ok.org"
      (i.toLong, s"https://$host/p/$i")
    }.toDF("doc_id", "url")
    val block = Seq("tracker.io").toDF("domain")
    val out = CurationPipeline.urlDomainFilter(
      docs, "doc_id", "url", block, "domain") // default: no cap
    val rows = out.select(col("doc_id"), col("domain"), col("domain_rank"))
      .collect()
    // blocklist semantics intact; rank column present but NULL (the
    // uncapped contract — nobody filters on it, so nobody pays for it)
    assert(rows.forall(_.getString(1) != "ads.tracker.io"))
    assert(rows.length === 200 - (0 until 200).count(_ % 3 == 0))
    assert(rows.forall(_.isNullAt(2)), "uncapped domain_rank must be NULL")
    // the plan pin: the whale-host-vulnerable shape (a per-host
    // row_number window) must be ABSENT when no cap was requested —
    // the blocklist anti-join is the whole plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowGroupLimit"), plan)
    assert(!plan.contains("Window ["), plan)
    assert(!plan.contains("row_number"), plan)
    // a capped call still ranks (the t64 contract, unchanged)
    val capped = CurationPipeline.urlDomainFilter(
      docs, "doc_id", "url", block, "domain", maxPerDomain = 3)
    assert(capped.select(max(col("domain_rank"))).collect()(0).getInt(0) === 3)
  }

  test("drift(sampleFraction) estimates the exact statistic without bias on the drift fixture") {
    // the IvfIndexSpec drift shape, scaled up so a 50% Bernoulli
    // sample has a tight standard error: train on A (dim-0 axis, two
    // dim-2 lobes), append B from a region the frozen matrix never
    // saw (dim-1 axis, dim-2 spread)
    val rnd = new scala.util.Random(7)
    val a = (0L until 400L).map { i =>
      val lobe = if (i % 2 == 0) 1.0 else -1.0
      i -> Seq(10.0, 0.0, lobe + 0.2 * rnd.nextDouble(), 0.0)
    }.toDF("vec_id", "embedding")
    val b = (1000L until 1400L).map { i =>
      i -> Seq(0.0, 10.0, -0.5 + rnd.nextDouble(), 0.0)
    }.toDF("vec_id", "embedding")
    val idx = new IvfIndex(spark,
      java.nio.file.Files.createTempDirectory("graft-driftsample").toString,
      nCells = 2)
    idx.append(a, "vec_id", "embedding") // trains → baseline stamped
    idx.append(b, "vec_id", "embedding") // the drifted batch
    val exact = idx.drift().get
    assert(exact > 0.02, s"fixture must drift: $exact")
    // full fraction is literally the exact path
    assert(idx.drift(1.0).get === exact)
    // a 50% sample estimates the same mean: with ~400 sampled rows
    // and per-row cosines in [0, 1] the standard error is ≲0.02 —
    // assert a loose 3σ-ish band AND that the estimate supports the
    // same retrain decision the exact statistic does
    val sampled = idx.drift(0.5).get
    assert(math.abs(sampled - exact) < 0.06,
      s"sampled drift $sampled vs exact $exact")
    // determinism: the seed is the head's manifest version, so
    // repeated audits of the SAME head read the same estimate
    assert(idx.drift(0.5).get === sampled)
    intercept[IllegalArgumentException](idx.drift(0.0))
    intercept[IllegalArgumentException](idx.drift(1.5))
  }

  test("an oversized _idbloom sidecar degrades to scan BEFORE being read into memory") {
    import graft.storage.SegmentIdBloom
    val dir = java.nio.file.Files.createTempDirectory("graft-bloomguard").toFile
    // a sparse 129 MB file — over the 128 MB ceiling; the guard is a
    // length check, so this must come back None without an OOM-sized
    // allocation (a real 129 MB slurp would pass too, but the point
    // is the file is never opened)
    val f = new java.io.File(dir, SegmentIdBloom.FileName)
    val raf = new java.io.RandomAccessFile(f, "rw")
    try raf.setLength((128L << 20) + 1) finally raf.close()
    assert(SegmentIdBloom.read(dir) === None,
      "oversized sidecar must degrade to always-scan")
    // and mayContain therefore never invents a skip
    assert(SegmentIdBloom.mayContain(dir, Some(Seq(1L))))
  }
}
