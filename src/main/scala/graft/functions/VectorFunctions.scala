package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `Array[Float]` columns, backed by
  * graft's native codegen expressions ([[VectorExpressions]]) — a
  * tight primitive loop inside whole-stage codegen, NOT an interpreted
  * higher-order function (`aggregate(zip_with(...))` evaluates its
  * lambda per element and dominated the ANN candidate joins).
  * Arithmetic is strict left-to-right double accumulation, which makes
  * results bit-reproducible across engines (the DuckDB oracle folds
  * lists in the same order).
  *
  * Null policy (see [[org.apache.spark.sql.graft.VectorExpressions]]):
  * `dot`/`cosine` over vectors of DIFFERENT lengths yield null — a
  * malformed embedding surfaces as a visible null, never a truncated
  * similarity; null ELEMENTS contribute 0.0. */
object VectorFunctions {
  import org.apache.spark.sql.graft.ColumnInternals.{column, expression}
  import org.apache.spark.sql.graft.VectorExpressions._

  /** Σ aᵢ·bᵢ as a strict left-to-right double accumulation. */
  def dot(a: Column, b: Column): Column =
    column(VecDot(expression(a), expression(b)))

  /** Σ aᵢ² (same accumulation discipline). */
  def normSq(a: Column): Column =
    column(VecNormSq(expression(a)))

  def l2Norm(a: Column): Column = sqrt(normSq(a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine when per-vector norms are already materialized — the form
    * every pairwise candidate join should use: norms are computed once
    * per VECTOR (n rows), not three array traversals per PAIR. */
  def cosinePre(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)

  /** Elementwise √Σ(aᵢ−bᵢ)² (HOF form — not on a pairwise hot path;
    * the expanded ‖a‖²−2a·b+‖b‖² form would differ numerically). */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, v) => acc + v))

  /** IVF assign/probe: indices of the `nProbe` nearest (by dot, i.e.
    * cosine for unit-norm centroids) centroids, most-similar first. */
  def nearestCentroids(v: Column, centroids: Seq[Seq[Double]], nProbe: Int): Column =
    org.apache.spark.sql.graft.ColumnInternals.column(
      org.apache.spark.sql.graft.VectorExpressions.NearestCentroids(
        org.apache.spark.sql.graft.ColumnInternals.expression(v), centroids, nProbe))

  /** Product-quantization code: per contiguous subspace, the index of
    * the nearest codeword by squared L2 (strict sequential fold,
    * lower-index tie-break). Codebook ships as a literal. */
  def pqEncode(v: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    column(PqEncode(expression(v), codebooks))

  /** Asymmetric PQ distance: Σ per-subspace squared L2 between the
    * query's subvector and the code's codeword — evaluated against
    * the M-int code column, never the raw corpus vector. */
  def pqAdc(q: Column, codes: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    column(PqAdc(expression(q), expression(codes), codebooks))

  /** Sign-bit LSH bucket from `nPlanes` fixed pseudo-random hyperplanes
    * (seeded, generated once on the driver — deterministic across
    * runs). Near vectors collide with high probability; used to
    * restrict ANN candidate generation to same-bucket pairs. */
  def lshBucket(a: Column, dim: Int, nPlanes: Int, seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(nPlanes, dim)(rnd.nextGaussian())
    val bits = planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit).toIndexedSeq: _*)
      when(dot(a, planeCol) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }
}
