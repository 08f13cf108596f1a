package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ColumnInternals, SketchExpressions}

/** Column wrappers for the native sketch expressions
  * (org.apache.spark.sql.graft.SketchExpressions) — one expression per
  * sketch instead of k aggregate columns, so Catalyst planning cost no
  * longer scales with signature width (measured ~2.5 s of driver
  * planning per minhash pipeline call in the k-column form). */
object SketchFunctions {

  /** MinHash signature aggregate over 64-bit shingle hashes: one
    * array<long> column, element i = min of XXH64(h, seed=i). */
  def minhashSig(hashCol: Column, k: Int): Column =
    ColumnInternals.column(SketchExpressions.MinHashSigAgg(
      ColumnInternals.expression(hashCol), k).toAggregateExpression())

  /** SimHash-64 aggregate over per-token 64-bit hashes. */
  def simhashSig(tokenHashCol: Column): Column =
    ColumnInternals.column(SketchExpressions.SimHashSigAgg(
      ColumnInternals.expression(tokenHashCol)).toAggregateExpression())

  /** Matching-component count between two signatures (the Jaccard
    * estimate numerator), codegen'd. */
  def matchCount(a: Column, b: Column): Column =
    ColumnInternals.column(SketchExpressions.LongArrayMatchCount(
      ColumnInternals.expression(a), ColumnInternals.expression(b)))

  /** Bottom-k collect: array of the k SMALLEST child values (total
    * order on the child type; structs compare lexicographically).
    * Backed by Spark's `CollectTopK` bounded priority queue, so the
    * partial aggregate contributes at most k values per partition —
    * a per-group top/bottom-k whose shuffle volume is O(k·groups)
    * regardless of group size, unlike a rank window that concentrates
    * every row of a group on one task. */
  def bottomK(c: Column, k: Int): Column =
    ColumnInternals.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK(
        ColumnInternals.expression(c), k, true).toAggregateExpression())

  /** Bloom-filter aggregate over 64-bit hashes (Spark's own
    * `BloomFilterAggregate`, the engine behind runtime row-level join
    * filtering): one serialized-filter binary column. `hashCol` must
    * already be an xxhash64 long — the same pre-hash discipline as the
    * minhash path (hash the value once, never shuffle raw text). */
  def bloomAgg(hashCol: Column, expectedItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    ColumnInternals.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        ColumnInternals.expression(hashCol),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
  }

  /** Membership probe against a serialized bloom filter
    * (`BloomFilterMightContain`, codegen'd). The filter side must be a
    * CONSTANT (e.g. `lit(bytes)` of a driver-collected aggregate —
    * Catalyst requires foldable/subquery there so the filter
    * deserializes once per task, not per row); false positives
    * possible, false negatives never. */
  def mightContain(bloom: Column, hashCol: Column): Column =
    ColumnInternals.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ColumnInternals.expression(bloom),
        ColumnInternals.expression(hashCol)))
}
