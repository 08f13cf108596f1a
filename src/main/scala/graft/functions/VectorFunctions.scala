package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `Array[Float]` columns, expressed
  * as higher-order Column functions (`zip_with`/`aggregate`) so they
  * codegen and never leave the executor. Arithmetic is forced to
  * double with a sequential fold, which makes results bit-reproducible
  * across engines (the DuckDB oracle folds lists in the same order). */
object VectorFunctions {

  /** Σ aᵢ·bᵢ as a strict left-to-right double fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Σ aᵢ² (same fold discipline). */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))

  def l2Norm(a: Column): Column = sqrt(normSq(a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, v) => acc + v))

  // Note on execution: these higher-order functions evaluate the
  // lambda per element outside whole-stage codegen, but the per-row
  // array traversal is tight; an unrolled element_at alternative was
  // measured SLOWER (64 boxed array accessors per row) — keep the
  // fold forms.

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
