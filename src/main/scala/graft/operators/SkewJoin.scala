package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's
  * skew-join splitting isn't enough (extreme single-key skew, e.g. one
  * entity owning half the facts at 100 TB).
  *
  * The skewed (large) side gets a random salt in [0, factor); the
  * replicated (smaller) side is exploded across all salt values, and
  * the join key becomes (key, salt) — one hot partition becomes
  * `factor` balanced ones at the cost of replicating the small side
  * `factor`×. */
object SkewJoin {

  def saltedJoin(
      large: DataFrame, largeKey: String,
      small: DataFrame, smallKey: String,
      factor: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(factor > 0)
    // the small side is replicated factor x; join types that preserve
    // it (right/full outer) would emit factor copies of every unmatched
    // small-side row
    require(Set("inner", "left", "leftouter").contains(
      joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins only, got $joinType")
    val salted = large.withColumn("__salt",
      (pmod(xxhash64(monotonically_increasing_id()), lit(factor.toLong))).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated,
      salted(largeKey) === replicated(smallKey) &&
        salted("__salt") === replicated("__salt"),
      joinType)
      .drop("__salt")
  }

  /** Top-k heavy keys of a column (to decide whether salting is
    * warranted and to pick `factor`). */
  def keySkew(df: DataFrame, key: String, topK: Int = 10): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(topK)
}
