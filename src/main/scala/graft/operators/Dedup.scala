package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions._

/** Deduplication for training-data pipelines, exact → fuzzy:
  *
  *  - exact: hash-groupBy (one shuffle on the content hash);
  *  - MinHash+LSH: shingle → k-perm signature → band buckets →
  *    same-bucket candidate join → optional exact-Jaccard verify;
  *  - SimHash: 64-bit signature → 4×16-bit chunk buckets (pigeonhole:
  *    hamming ≤ 3 ⇒ at least one identical chunk) → verify hamming;
  *  - n-gram Jaccard: exact set similarity, LSH-bounded candidates;
  *  - embedding cosine: sign-bit LSH buckets → cosine verify.
  *
  * Scale design: no operator ever materializes the O(n²) pair space —
  * candidates come from equi-joins on bucket keys, which Spark executes
  * as shuffles partitioned by bucket. Skewed buckets (a shingle-free
  * short doc, a zero vector) are the classic hazard; AQE skew-join
  * splitting handles moderate skew, and `maxBucket` caps degenerate
  * buckets outright (log-and-drop, the standard trade in web-dedup). */
object Dedup {

  /** Exact duplicate groups by md5 of the content columns. */
  def exactGroups(df: DataFrame, idCol: String, contentCols: Seq[String]): DataFrame =
    df.withColumn("content_hash", md5(concat_ws("", contentCols.map(col): _*)))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("n"), sort_array(collect_list(col(idCol))).as("ids"))
      .filter(col("n") > 1)

  /** Keep exactly one row per content hash (deterministic: min id). */
  def exactDedup(df: DataFrame, idCol: String, contentCols: Seq[String]): DataFrame = {
    val h = md5(concat_ws("", contentCols.map(col): _*))
    val w = Window.partitionBy(h).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash+LSH near-duplicate candidate pairs (id1 < id2), optionally
    * verified with exact Jaccard over the shingle sets. `bands` must
    * divide `numHashes`; collision probability ≈ 1-(1-j^r)^b. */
  def minhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 5, numHashes: Int = 64, bands: Int = 16,
      minJaccard: Option[Double] = None,
      maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigs = df.select(
      col(idCol).as("id"),
      charShingles(col(textCol), shingleN).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .withColumn("sig", minhashSignature(col("shingles"), numHashes))
    val banded = sigs.select(
      col("id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * rows + 1, rows)).as("bh"))): _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    // Cap degenerate buckets (see scaladoc): count per bucket, drop huge.
    val sized = banded.withColumn("bn",
      count(lit(1)).over(Window.partitionBy(col("band"), col("bh"))))
      .filter(col("bn") <= maxBucket)
    val a = sized.select(col("band"), col("bh"), col("id").as("id1"))
    val b = sized.select(col("band"), col("bh"), col("id").as("id2"))
    val cand = a.join(b, Seq("band", "bh"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    minJaccard match {
      case None => cand
      case Some(j) =>
        val sh = sigs.select(col("id"), col("shingles"))
        cand
          .join(sh.withColumnsRenamed(Map("id" -> "id1", "shingles" -> "sh1")), Seq("id1"))
          .join(sh.withColumnsRenamed(Map("id" -> "id2", "shingles" -> "sh2")), Seq("id2"))
          .withColumn("jaccard",
            size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
              size(array_union(col("sh1"), col("sh2"))))
          .filter(col("jaccard") >= j)
          .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
    }
  }

  /** SimHash near-duplicate pairs with hamming ≤ maxHamming (≤ 15 for
    * guaranteed recall with 4 chunks; default 3). */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"),
      simhash64(tokens(col(textCol))).as("sim"))
    val chunked = sigs.select(col("id"), col("sim"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("ci"),
          shiftright(col("sim"), i * 16).bitwiseAND(0xFFFFL).as("cv"))): _*)).as("ch"))
      .select(col("id"), col("sim"), col("ch.ci").as("ci"), col("ch.cv").as("cv"))
    val a = chunked.select(col("ci"), col("cv"), col("id").as("id1"), col("sim").as("sim1"))
    val b = chunked.select(col("ci"), col("cv"), col("id").as("id2"), col("sim").as("sim2"))
    a.join(b, Seq("ci", "cv"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        hamming64(col("sim1"), col("sim2")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity pairs ≥ threshold; candidates
    * LSH-bounded via minhash banding (never all-pairs). */
  def jaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, minJaccard: Double = 0.5): DataFrame =
    minhashPairs(df, idCol, textCol, shingleN,
      numHashes = 64, bands = 32, minJaccard = Some(minJaccard))

  /** Embedding near-duplicate pairs: cosine ≥ threshold, candidates
    * restricted to sign-bit LSH buckets (nPlanes small keeps recall
    * high for the ≥0.95 regime dedup cares about). */
  def embeddingPairs(
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      minCosine: Double = 0.95, nPlanes: Int = 8): DataFrame = {
    import graft.functions.VectorFunctions
    val withBucket = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", VectorFunctions.lshBucket(col("v"), dim, nPlanes))
    val a = withBucket.select(col("bucket"), col("id").as("id1"), col("v").as("v1"))
    val b = withBucket.select(col("bucket"), col("id").as("id2"), col("v").as("v2"))
    a.join(b, Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .withColumn("cosine", VectorFunctions.cosine(col("v1"), col("v2")))
      .filter(col("cosine") >= minCosine)
      .select(col("id1"), col("id2"), round(col("cosine"), 6).as("cosine"))
      .distinct()
  }
}
