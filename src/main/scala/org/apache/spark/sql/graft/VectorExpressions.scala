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

  /** Product-quantization encode (Jégou et al., "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011): split the vector into
    * `M` contiguous subvectors and emit, per subspace, the index of
    * the nearest codeword by squared L2 distance — the vector's M-byte
    * PQ code. The codebook rides along as a literal (M × ksub × subDim
    * doubles — tiny), so encoding is one tight loop per row with no
    * join: the pass that turns a 100 TB float corpus into a ~3 TB code
    * table.
    *
    * Distances are strict left-to-right double accumulations of
    * (aᵢ−bᵢ)² per subspace, ties break on the lower codeword index,
    * and the argmin compares raw doubles — a relational engine
    * replaying the identical fold gets the identical codes (gate t48).
    * Length ≠ M·subDim ⇒ null (malformed embeddings surface, as
    * [[VecDot]]); all-NaN distances fall to codeword 0
    * deterministically. */
  final case class PqEncode(
      child: Expression, codebooks: Seq[Seq[Seq[Double]]])
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
      with ExpectsInputTypes {
    private val m = codebooks.length
    private val ksub = codebooks.headOption.map(_.length).getOrElse(0)
    private val subDim =
      codebooks.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)
    require(m > 0 && ksub > 0 && subDim > 0, "empty codebook")
    require(codebooks.forall(b => b.length == ksub && b.forall(_.length == subDim)),
      s"codebook must be uniform ${m}x${ksub}x$subDim")
    override def inputTypes: Seq[AbstractDataType] = Seq(vecType)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "pq_encode"

    @transient private lazy val mat: Array[Array[Array[Double]]] =
      codebooks.map(_.map(_.toArray).toArray).toArray

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return null
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() != m * subDim) return null
      val out = new Array[Int](m)
      var mm = 0
      while (mm < m) {
        val base = mm * subDim
        var best = -1
        var bestD = Double.PositiveInfinity
        var c = 0
        while (c < ksub) {
          val cw = mat(mm)(c)
          var sub = 0.0
          var i = 0
          while (i < subDim) {
            val d = elemAt(child.dataType, arr, base + i) - cw(i)
            sub += d * d
            i += 1
          }
          if (best < 0 || sub < bestD) { best = c; bestD = sub }
          c += 1
        }
        out(mm) = best
        mm += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): PqEncode =
      copy(child = newChild)
  }

  /** Asymmetric-distance computation against a PQ code: Σ over
    * subspaces of the squared L2 distance between the QUERY's
    * subvector and the corpus vector's chosen codeword. The scan side
    * reads M ints per row instead of the full float vector — PQ's
    * whole point at 100 TB — and this is the candidate-loop hot path,
    * so it generates a primitive loop inside whole-stage codegen.
    *
    * Accumulation bracketing is (…((0+d₀)+d₁)…+d_{M−1}) with each dₘ
    * itself a strict left-to-right subspace fold — the shape a
    * relational replay reproduces with an ordered per-subspace list
    * fold. Null / length-mismatched / out-of-range inputs ⇒ null. */
  final case class PqAdc(
      left: Expression, right: Expression, codebooks: Seq[Seq[Seq[Double]]])
      extends BinaryExpression with ExpectsInputTypes {
    private val m = codebooks.length
    private val ksub = codebooks.headOption.map(_.length).getOrElse(0)
    private val subDim =
      codebooks.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)
    require(m > 0 && ksub > 0 && subDim > 0, "empty codebook")
    require(codebooks.forall(b => b.length == ksub && b.forall(_.length == subDim)),
      s"codebook must be uniform ${m}x${ksub}x$subDim")
    override def inputTypes: Seq[AbstractDataType] =
      Seq(vecType, ArrayType(IntegerType))
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "pq_adc"

    // flattened [(mm*ksub + c)*subDim + i] for codegen reference
    @transient private lazy val flat: Array[Double] = {
      val a = new Array[Double](m * ksub * subDim)
      var j = 0
      for (b <- codebooks; cw <- b; x <- cw) { a(j) = x; j += 1 }
      a
    }

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val q = a.asInstanceOf[ArrayData]
      val codes = b.asInstanceOf[ArrayData]
      if (q.numElements() != m * subDim || codes.numElements() != m) return null
      var acc = 0.0
      var mm = 0
      while (mm < m) {
        if (codes.isNullAt(mm)) return null
        val c = codes.getInt(mm)
        if (c < 0 || c >= ksub) return null
        val off = (mm * ksub + c) * subDim
        val base = mm * subDim
        var sub = 0.0
        var i = 0
        while (i < subDim) {
          val d = elemAt(left.dataType, q, base + i) - flat(off + i)
          sub += d * d
          i += 1
        }
        acc += sub
        mm += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("pqCodebook", flat, "double[]")
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val mm = ctx.freshName("mm"); val i = ctx.freshName("i")
        val c = ctx.freshName("c"); val acc = ctx.freshName("acc")
        val sub = ctx.freshName("sub"); val d = ctx.freshName("d")
        val off = ctx.freshName("off"); val base = ctx.freshName("base")
        val bad = ctx.freshName("bad")
        s"""
        if ($a.numElements() != ${m * subDim} || $b.numElements() != $m) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          boolean $bad = false;
          for (int $mm = 0; $mm < $m && !$bad; $mm++) {
            if ($b.isNullAt($mm)) { $bad = true; break; }
            int $c = $b.getInt($mm);
            if ($c < 0 || $c >= $ksub) { $bad = true; break; }
            int $off = ($mm * $ksub + $c) * $subDim;
            int $base = $mm * $subDim;
            double $sub = 0.0;
            for (int $i = 0; $i < $subDim; $i++) {
              double $d = ${elemAccessor(left.dataType, a, s"$base + $i")} -
                $cbRef[$off + $i];
              $sub += $d * $d;
            }
            $acc += $sub;
          }
          if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
        }
        """
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): PqAdc =
      copy(left = newLeft, right = newRight)
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
