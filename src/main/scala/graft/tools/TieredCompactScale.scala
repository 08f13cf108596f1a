package graft.tools

import org.apache.spark.sql.functions._

/** Maintenance-cost scaling of the persisted-index compaction policies
  * (VERDICT r14 missing #1): a MinHash index holding a k×-scaled
  * compacted GIANT plus a FIXED set of small per-trigger appends is
  * maintained two ways —
  *
  *  - `compactTiered`: folds only the small segments' tier; the wall
  *    must stay ~FLAT as k grows (merged bytes are constant — the
  *    giant is never rewritten), which is the property that makes
  *    routine maintenance payable at 100 TB;
  *  - full `compact()`: rewrites the whole corpus; its wall must grow
  *    ∝ k — the bill the tiered policy exists to avoid paying per
  *    maintenance call.
  *
  * The giant corpus is the ScaleCheck synthesis shape (key-shifted,
  * token-suffixed copies of range-generated docs — vocabulary grows
  * with k, cross-copy near-dup structure is zero). Results are
  * asserted invariant per k by probing admission before and after
  * each maintenance call.
  *
  * Usage: runMain graft.tools.TieredCompactScale [ks...] (default 1 4 16) */
object TieredCompactScale {
  def main(args: Array[String]): Unit = {
    val ks = if (args.isEmpty) Seq(1, 4, 16) else args.map(_.toInt).toSeq
    val spark = graft.SparkBoot.session(graft.SparkBoot.cpusFromEnv, "ERROR")
    val baseDocs = 20000L

    def docs(n: Long, idShift: Long, tokenTag: String) =
      spark.range(n).select(
        (col("id") + lit(idShift)).as("doc_id"),
        concat_ws(" ",
          (0 until 24).map(j => concat(lit(s"w$j$tokenTag"),
            pmod(col("id") * lit(j + 1), lit(97L)))): _*).as("text"))

    ks.foreach { k =>
      val dir = java.nio.file.Files.createTempDirectory(
        s"graft-tierscale-$k").toString
      val idx = new graft.storage.MinHashIndex(spark, dir,
        shingle = graft.operators.Dedup.WordGrams(2),
        numHashes = 64, bands = 16, nBuckets = 32)
      // the giant: k copies of the base corpus, disjoint ids and
      // vocabulary, landed as one bulk append then left alone
      (0 until k).foreach { i =>
        idx.append(docs(baseDocs, i * 10000000L, s"c$i"), "doc_id", "text")
      }
      idx.compact() // the giant is ONE compacted segment
      val giant = idx.segments.head
      // the fixed per-trigger tail: identical at every k
      (0 until 6).foreach { j =>
        idx.append(docs(200L, 900000000L + j * 1000L, "tail"),
          "doc_id", "text")
      }
      val probeIn = docs(500L, 950000000L, "probe")
      def admit(): Long = graft.operators.PipelineContext.materialize {
        implicit ctx =>
          idx.dedupAgainst(probeIn, "doc_id", "text", minJaccard = 0.5)
      }.count()
      val before = admit()

      val t0 = System.nanoTime()
      val folded = idx.compactTiered(10)
      val tieredWall = (System.nanoTime() - t0) / 1e9
      require(folded == 6, s"expected the 6 tail segments to fold: $folded")
      require(idx.segments.contains(giant), "giant must not be rewritten")
      require(admit() == before, "tiered compact changed results")

      val t1 = System.nanoTime()
      idx.compact()
      val fullWall = (System.nanoTime() - t1) / 1e9
      require(admit() == before, "full compact changed results")

      println(f"TIERSCALE k=$k%-3d giant_docs=${k * baseDocs}%-8d " +
        f"tiered_wall=$tieredWall%7.2f s (folded $folded small segs)  " +
        f"full_wall=$fullWall%7.2f s")
    }
    spark.stop()
  }
}
