package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding-vector arithmetic.
  *
  * The higher-order-function forms (`aggregate(zip_with(...))`) are
  * interpreted per element OUTSIDE whole-stage codegen — fine for one
  * pass over a table, but the dominant cost when a candidate join
  * evaluates millions of pairs (ANN, embedding dedup). These
  * expressions generate a tight primitive loop inside codegen instead;
  * same arithmetic, same strict left-to-right double accumulation, so
  * results stay bit-identical to the fold forms (and to the DuckDB
  * oracle's `list_reduce` with a 0.0 seed).
  *
  * Null policy: a length MISMATCH between the two vectors yields a
  * null result (visible, like the fold forms' null-poisoning — never a
  * silently truncated similarity). A null ELEMENT contributes 0.0 (the
  * corpora these serve never contain null elements; 0.0 keeps the loop
  * branch-light instead of null-poisoning the whole result).
  */
object VectorExpressions {

  private val vecType = TypeCollection(
    ArrayType(FloatType), ArrayType(DoubleType))

  private def elemAccessor(t: DataType, arr: String, i: String): String =
    t.asInstanceOf[ArrayType].elementType match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }

  private def elemAt(t: DataType, arr: ArrayData, i: Int): Double =
    t.asInstanceOf[ArrayType].elementType match {
      case FloatType => arr.getFloat(i).toDouble
      case _ => arr.getDouble(i)
    }

  /** Indices of the `nProbe` centroids with the largest dot product
    * against the input vector, most-similar first — the IVF assign /
    * probe step as ONE expression. The centroid matrix rides along as a
    * literal (trained driver-side on a sample, k×dim doubles — tiny),
    * so assignment is a tight k×dim loop per row with no join and no
    * per-row allocation beyond the selection arrays. Centroids are
    * expected unit-norm, making dot order = cosine order. Ties break on
    * the lower centroid index; null vector ⇒ null. */
  final case class NearestCentroids(
      child: Expression, centroids: Seq[Seq[Double]], nProbe: Int)
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
      with ExpectsInputTypes {
    require(nProbe >= 1 && nProbe <= centroids.size,
      s"nProbe must be in [1, ${centroids.size}], got $nProbe")
    override def inputTypes: Seq[AbstractDataType] = Seq(vecType)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "nearest_centroids"

    @transient private lazy val mat: Array[Array[Double]] =
      centroids.map(_.toArray).toArray

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return null
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val k = mat.length
      val scores = new Array[Double](k)
      var c = 0
      while (c < k) {
        val cent = mat(c)
        // dimension mismatch ⇒ null, matching VecDot's policy: a
        // malformed embedding must surface, not silently assign to an
        // arbitrary cell from a truncated dot product
        if (n != cent.length) return null
        var s = 0.0
        var i = 0
        while (i < n) {
          s += elemAt(child.dataType, arr, i) * cent(i)
          i += 1
        }
        scores(c) = s
        c += 1
      }
      // selection by repeated max — nProbe is tiny (≤ k ≤ dozens).
      // `>=` on the first untaken index keeps `best` valid even when
      // every score is NaN (a NaN component poisons all dots); such
      // rows fall into a deterministic cell instead of crashing.
      val out = new Array[Int](nProbe)
      val taken = new Array[Boolean](k)
      var p = 0
      while (p < nProbe) {
        var best = -1
        var bestS = Double.NegativeInfinity
        var j = 0
        while (j < k) {
          if (!taken(j) && (best < 0 || scores(j) > bestS)) {
            best = j; bestS = scores(j)
          }
          j += 1
        }
        taken(best) = true
        out(p) = best
        p += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
      copy(child = newChild)
  }

  /** Σ aᵢ·bᵢ — strict sequential double accumulation.
    *
    * Length mismatch ⇒ null (a malformed embedding must surface as a
    * visible null, like the aggregate(zip_with(...)) fold form it
    * replaces, not as a plausible-but-wrong truncated similarity). */
  final case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(vecType, vecType)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true // length mismatch ⇒ null
    override def prettyName: String = "vec_dot"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return null
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i) && !y.isNullAt(i))
          acc += elemAt(left.dataType, x, i) * elemAt(right.dataType, y, i)
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
              $acc += ${elemAccessor(left.dataType, a, i)} *
                ${elemAccessor(right.dataType, b, i)};
            }
          }
          ${ev.value} = $acc;
        }
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): VecDot =
      copy(left = newLeft, right = newRight)
  }

  /** Σ aᵢ² — strict sequential double accumulation. */
  final case class VecNormSq(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(vecType)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_norm_sq"

    override protected def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var acc = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) {
        if (!x.isNullAt(i)) {
          val v = elemAt(child.dataType, x, i); acc += v * v
        }
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val acc = ctx.freshName("acc"); val v = ctx.freshName("v")
        s"""
        int $n = $a.numElements();
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i)) {
            double $v = ${elemAccessor(child.dataType, a, i)};
            $acc += $v * $v;
          }
        }
        ${ev.value} = $acc;
        """
      })

    override protected def withNewChildInternal(newChild: Expression): VecNormSq =
      copy(child = newChild)
  }
}
