package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]] is the exact baseline: broadcast the (small)
  *    query set against the corpus — one pass, no shuffle of the
  *    corpus, `TakeOrdered`-style window per query. At 100 TB this is
  *    the correct plan whenever |queries| is broadcastable.
  *  - [[lshTopK]] is the scale path for large query sets: both sides
  *    bucketed by sign-bit LSH (multi-probe over the query's bucket),
  *    candidates joined per bucket, cosine reranked. Recall < 1 by
  *    construction; raise nProbes/lower nPlanes to trade cost for
  *    recall. */
object Similarity {

  /** Exact top-k neighbors per query vector by cosine. Queries must be
    * driver-small (broadcast). Deterministic tie-break on corpus id. */
  def bruteForceTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int): DataFrame = {
    // norms once per VECTOR (n + q rows), not per PAIR (n×q rows) —
    // the pair loop then does a single codegen'd dot per candidate
    val joined = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nv", l2Norm(col("v")))
      .crossJoin(broadcast(queries.select(col(qidCol).as("qid"), col(qvecCol).as("qv"))
        .withColumn("nq", l2Norm(col("qv")))))
      .withColumn("cosine", cosinePre(dot(col("v"), col("qv")), col("nv"), col("nq")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** LSH-bucketed ANN: candidates from matching sign-bit buckets, with
    * multi-probe (flip 1 bit) to recover near-boundary neighbors, then
    * exact cosine rerank within candidates. */
  def lshTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, dim: Int, nPlanes: Int = 8,
      excludeSelf: Boolean = false): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", lshBucket(col("v"), dim, nPlanes))
      .withColumn("nv", l2Norm(col("v")))
    val qBase = queries.select(col(qidCol).as("qid"), col(qvecCol).as("qv"))
      .withColumn("qbucket", lshBucket(col("qv"), dim, nPlanes))
      .withColumn("nq", l2Norm(col("qv")))
    // multi-probe: the bucket itself plus each 1-bit flip
    val probes = qBase.withColumn("bucket",
      explode(array(
        (col("qbucket") +: (0 until nPlanes).map(i =>
          col("qbucket").bitwiseXOR(shiftleft(lit(1L), i)))): _*)))
      .select(col("qid"), col("qv"), col("nq"), col("bucket"))
    val candRaw = c.join(probes, Seq("bucket"))
    // self-exclusion must precede ranking or rank 1 is burned on the
    // query's own vector (rank gaps + k-1 usable neighbors)
    val cand = (if (excludeSelf) candRaw.filter(col("id") =!= col("qid")) else candRaw)
      .withColumn("cosine", cosinePre(dot(col("v"), col("qv")), col("nv"), col("nq")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), round(col("cosine"), 6).as("cosine"), col("rank"))
  }
}
