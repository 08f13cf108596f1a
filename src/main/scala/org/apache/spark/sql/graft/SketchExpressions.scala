package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst forms of the dedup sketches.
  *
  * The column-expression versions (k separate `min(xxhash64(h, i))`
  * aggregate columns, a 64-term `element_at` comparison chain) are
  * correct but QUADRATICALLY expensive to PLAN: Catalyst canonicalizes
  * and folds each of the k columns through every optimizer rule, and
  * the round-3/4 profiles measured ~2.5 s of serialized driver planning
  * per minhash pipeline call — more than the query's own execution at
  * sf0.1. These collapse the sketch to ONE expression each, so plan
  * width no longer scales with k. Execution work is identical (same
  * per-row hash count); the aggregate also dodges the k-column
  * row-buffer round trip.
  */
object SketchExpressions {

  /** MinHash signature as one aggregate column: element i of the
    * result = min over input rows of XXH64(hash, seed = i). Input rows
    * are the (already 64-bit) shingle hashes of one document.
    *
    * Seeded-rehash permutation approximation — same construction as
    * the k-column form; the exact seeding scheme is free to differ
    * because every consumer either estimates (banding, estimate
    * prefilter) or verifies with exact Jaccard. */
  final case class MinHashSigAgg(
      child: Expression,
      k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "minhash_sig"
    override def children: Seq[Expression] = Seq(child)

    override def createAggregationBuffer(): Array[Long] =
      Array.fill(k)(Long.MaxValue)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val h = v.asInstanceOf[Long]
        var i = 0
        while (i < k) {
          val m = XXH64.hashLong(h, i)
          if (m < buf(i)) buf(i) = m
          i += 1
        }
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 * k)
      var i = 0
      while (i < k) { bb.putLong(buf(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      Array.fill(k)(bb.getLong())
    }

    override def withNewMutableAggBufferOffset(n: Int): MinHashSigAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): MinHashSigAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): MinHashSigAgg =
      copy(child = newChildren.head)
  }

  /** SimHash-64 as one aggregate column over exploded tokens: bit i of
    * the result is the sign of Σ (2·bit_i(xxhash64(token)) − 1).
    * Replaces 64 per-row bit-extract expressions + 64 sum columns. */
  final case class SimHashSigAgg(
      child: Expression,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Int]] with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def prettyName: String = "simhash_sig"
    override def children: Seq[Expression] = Seq(child)

    override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

    override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
      val v = child.eval(input)
      if (v != null) {
        val h = v.asInstanceOf[Long]
        var i = 0
        while (i < 64) {
          buf(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
          i += 1
        }
      }
      buf
    }

    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < 64) { a(i) += b(i); i += 1 }
      a
    }

    override def eval(buf: Array[Int]): Any = {
      var sig = 0L
      var i = 0
      while (i < 64) { if (buf(i) > 0) sig |= (1L << i); i += 1 }
      sig
    }

    override def serialize(buf: Array[Int]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 * 64)
      var i = 0
      while (i < 64) { bb.putInt(buf(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Int] = {
      val bb = ByteBuffer.wrap(bytes)
      Array.fill(64)(bb.getInt())
    }

    override def withNewMutableAggBufferOffset(n: Int): SimHashSigAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): SimHashSigAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): SimHashSigAgg =
      copy(child = newChildren.head)
  }

  /** Per-language stopword-hit ratios in ONE pass: for a token array,
    * returns array<double> with element i = (#tokens in language i's
    * stopword set) / #tokens (0.0 for empty/null input — the fold
    * forms' convention). Each token costs ONE hash lookup against a
    * combined token→language-bitmask map, replacing k interpreted
    * `filter(array_contains(...))` HOF scans whose membership test was
    * itself a linear array probe (measured as the annotate stage's
    * dominant cost). `langSets` is ordered; the output matches it. */
  final case class StopwordRatios(
      child: Expression, langSets: Seq[Seq[String]])
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
      with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "stopword_ratios"

    @transient private lazy val nLangs = langSets.size
    /** token → bitmask of languages whose stopword set contains it. */
    @transient private lazy val masks: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer] = {
      val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer]()
      langSets.zipWithIndex.foreach { case (words, i) =>
        words.foreach { w =>
          val k = org.apache.spark.unsafe.types.UTF8String.fromString(w)
          val prev = m.get(k)
          m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
        }
      }
      m
    }

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      val counts = new Array[Int](nLangs)
      var n = 0
      if (v != null) {
        val arr = v.asInstanceOf[ArrayData]
        n = arr.numElements()
        var i = 0
        while (i < n) {
          if (!arr.isNullAt(i)) {
            val mask = masks.get(arr.getUTF8String(i))
            if (mask != null) {
              var bits = mask.intValue()
              while (bits != 0) {
                val b = java.lang.Integer.numberOfTrailingZeros(bits)
                counts(b) += 1
                bits &= bits - 1
              }
            }
          }
          i += 1
        }
      }
      val out = new Array[Double](nLangs)
      if (n > 0) {
        var i = 0
        while (i < nLangs) { out(i) = counts(i).toDouble / n; i += 1 }
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): StopwordRatios =
      copy(child = newChild)
  }

  /** Rolling xxhash64 fold over a string array — the chain
    * `aggregate(arr, 0L, (acc, t) => xxhash64(t, acc))` as ONE native
    * expression. The HOF form interprets the lambda per element
    * (measured ~10× slower than compiled loops on token arrays); this
    * keeps the per-token work in one compiled loop per row. Bit-exact
    * with the HOF: each step folds through XxHash64Function exactly as
    * the two-child xxhash64(t, acc) does (t at seed 42, then acc at the
    * intermediate hash), and null elements skip the string step just
    * like a null child of xxhash64. Null array → null. */
  final case class ChainHash64(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
      with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "chain_hash64"

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return null
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var acc = 0L
      var i = 0
      while (i < n) {
        val h =
          if (arr.isNullAt(i)) 42L
          else org.apache.spark.sql.catalyst.expressions.XxHash64Function
            .hash(arr.getUTF8String(i), StringType, 42L)
        acc = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(acc, LongType, h)
        i += 1
      }
      acc
    }

    override protected def withNewChildInternal(newChild: Expression): ChainHash64 =
      copy(child = newChild)
  }

  /** Rolling md5-hex fold over a string array — the engine-portable
    * `aggregate(arr, 'seed', (acc, t) => md5(concat(acc, t)))` chain as
    * one native expression (DuckDB replicates it with list_reduce, so
    * it can sit under the differential oracle). Bit-exact with the HOF:
    * each step digests the concatenated UTF-8 bytes and re-hexes; a
    * null element nulls the whole fold (concat's null propagation).
    * Null array → null. */
  final case class Md5Fold(child: Expression, seed: String)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
      with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "md5_fold"

    @transient private lazy val hexDigits = "0123456789abcdef".toCharArray

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return null
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val md = java.security.MessageDigest.getInstance("MD5")
      var acc = seed.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) return null
        md.reset()
        md.update(acc)
        md.update(arr.getUTF8String(i).getBytes)
        val digest = md.digest()
        val hex = new Array[Byte](32)
        var j = 0
        while (j < 16) {
          hex(2 * j) = hexDigits((digest(j) >> 4) & 0xf).toByte
          hex(2 * j + 1) = hexDigits(digest(j) & 0xf).toByte
          j += 1
        }
        acc = hex
        i += 1
      }
      org.apache.spark.unsafe.types.UTF8String.fromBytes(acc)
    }

    override protected def withNewChildInternal(newChild: Expression): Md5Fold =
      copy(child = newChild)
  }

  /** 1 − (#distinct adjacent-token bigrams / #bigrams) over a string
    * array, in one compiled loop per row — the transform(sequence)+
    * slice+concat HOF form interpreted per bigram and measured 10 s on
    * a 5k-doc pass (~60× this form). Distinctness is exact string
    * equality ("a b" built with a single space), matching the DuckDB
    * list_distinct differential. Empty/null input ⇒ 0.0 (no signal,
    * not null — the filter stage treats it as non-repetitive). */
  final case class BigramRepetition(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
      with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = false
    override def prettyName: String = "bigram_repetition"

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return 0.0
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n < 2) return 0.0
      val seen = new java.util.HashSet[String](n * 2)
      // each element converts from UTF8String ONCE (carried as `prev`)
      var prev = if (arr.isNullAt(0)) null else arr.getUTF8String(0).toString
      var i = 1
      while (i < n) {
        val cur = if (arr.isNullAt(i)) null else arr.getUTF8String(i).toString
        seen.add(prev + " " + cur)
        prev = cur
        i += 1
      }
      1.0 - seen.size.toDouble / (n - 1)
    }

    override protected def withNewChildInternal(newChild: Expression): BigramRepetition =
      copy(child = newChild)
  }

  /** Distinct word n-gram shingles of a token array, in one pass per
    * row — exact replacement for the HOF form
    * `array_distinct(transform(sequence(0, greatest(size(t)-n, 0)),
    * i => concat_ws(" ", slice(t, i+1, n))))`, which re-evaluates the
    * whole child (the trim+lower+regex split of the document) PER
    * LAMBDA ELEMENT — O(tokens²) regex work per row, measured 2.6 s
    * over a 4.5 k-doc pass where this form is ~0.1 s. Semantics are
    * bit-identical to the HOF: fewer than n tokens (including an
    * empty array) yield ONE truncated shingle (possibly ""),
    * null tokens are skipped `concat_ws`-style, and distinctness
    * keeps first-occurrence order like `array_distinct` — and a NULL
    * token array yields NULL (the HOF's `transform(null)` → null), so
    * null-text documents still vanish at the downstream explode. */
  final case class WordShingles(child: Expression, n: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
      with ExpectsInputTypes {
    require(n >= 1, "shingle width must be >= 1")
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "word_shingles"

    private val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return null
      val arr = v.asInstanceOf[ArrayData]
      val sz = arr.numElements()
      val last = math.max(sz - n, 0) // 0-based start of the final shingle
      val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String](
        2 * (last + 1))
      var i = 0
      while (i <= last) {
        val end = math.min(i + n, sz)
        val parts = new Array[org.apache.spark.unsafe.types.UTF8String](end - i)
        var j = i
        while (j < end) { // nulls stay null: concatWs skips them
          if (!arr.isNullAt(j)) parts(j - i) = arr.getUTF8String(j)
          j += 1
        }
        seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*))
        i += 1
      }
      new GenericArrayData(seen.toArray(
        new Array[org.apache.spark.unsafe.types.UTF8String](seen.size))
        .asInstanceOf[Array[Any]])
    }

    override protected def withNewChildInternal(newChild: Expression): WordShingles =
      copy(child = newChild)
  }

  /** Content-defined span blocks of a token array, in one pass per row
    * — the boundary-selection stage of the anchored ExactSubstr dedup
    * (CurationPipeline.dedupSpansAnchored). Exact replacement for the
    * five-column HOF chain (anchor filter, boundary concat, stride
    * flatten, sentinel append, block transform) that evaluated
    * `conv(substring(md5(tok), 1, 8), 16, 10) % mod` per token through
    * three string materializations (hex digest, substring, decimal
    * conv) plus five GenericArrayData intermediates per row — measured
    * ~2× the whole operator's oracle wall at sf0.1. Semantics are
    * bit-identical: token i (1-based, i ≥ 2) OPENS a block when the
    * first 4 bytes of md5(token) — the value DuckDB's
    * `CAST(CONCAT('0x', substring(md5(t),1,8)) AS BIGINT)` reads —
    * are ≡ 0 (mod anchorMod); anchor gaps longer than `maxBlockTokens`
    * are cut at maxBlockTokens strides from the gap's left edge; the
    * result is array<struct<p:int, b:string>> with p the 1-based
    * block-start position and b the space-joined block (empty doc →
    * one (1, "") row, matching `slice` + `concat_ws` on empties).
    * Null token array → null (split() never yields one; totality for
    * free). */
  final case class AnchoredSpanBlocks(child: Expression, maxBlockTokens: Int,
      anchorMod: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
      with ExpectsInputTypes {
    require(maxBlockTokens >= 1, "maxBlockTokens must be >= 1")
    require(anchorMod >= 1, "anchorMod must be >= 1")
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("p", IntegerType, nullable = false),
      StructField("b", StringType, nullable = false))), containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "anchored_span_blocks"

    // MessageDigest is stateful; one per thread (a local[n] executor
    // runs many tasks over the same expression instance)
    @transient private lazy val md =
      ThreadLocal.withInitial[java.security.MessageDigest](() =>
        java.security.MessageDigest.getInstance("MD5"))
    private val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return null
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val digest = md.get()
      // boundaries: 1, every anchor position in [2, n], sentinel n+1
      // (n = 0 degenerates to [1, 2] — one empty block, like the HOF)
      val e = new scala.collection.mutable.ArrayBuffer[Int](n / anchorMod + 2)
      e += 1
      var i = 2
      while (i <= n) {
        val tok = if (arr.isNullAt(i - 1)) null else arr.getUTF8String(i - 1)
        if (tok != null) {
          digest.reset()
          val h = digest.digest(tok.getBytes)
          // first 8 hex chars = first 4 bytes, unsigned big-endian
          val bucket = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
            ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
          if (bucket % anchorMod == 0) e += i
        }
        i += 1
      }
      val dend = math.max(n, 1) + 1
      e += dend
      // block starts: each [e(k), e(k+1)) gap tiled at maxBlockTokens
      val starts = new scala.collection.mutable.ArrayBuffer[Int](e.length)
      var k = 0
      while (k < e.length - 1) {
        var s = e(k)
        while (s < e(k + 1)) { starts += s; s += maxBlockTokens }
        k += 1
      }
      val out = new Array[Any](starts.length)
      k = 0
      while (k < starts.length) {
        val from = starts(k)
        val until = if (k + 1 < starts.length) starts(k + 1) else dend
        val parts = new Array[org.apache.spark.unsafe.types.UTF8String](
          math.min(until, n + 1) - from)
        var j = from
        while (j <= n && j < until) { // nulls stay null: concatWs skips
          if (!arr.isNullAt(j - 1)) parts(j - from) = arr.getUTF8String(j - 1)
          j += 1
        }
        out(k) = InternalRow(from,
          org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*))
        k += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): AnchoredSpanBlocks =
      copy(child = newChild)
  }

  /** Per-row token multiplicity map: array<string> → map<token, count>
    * (first-occurrence key order, null tokens skipped). One pass per
    * row, replacing the explode → corpus-wide groupBy(id, term) that
    * re-shuffled every token occurrence as its own row: the per-doc
    * aggregation happens rowside for free, the downstream explode
    * carries one row per DISTINCT term per doc, and the only remaining
    * shuffles are the term-keyed statistics that genuinely need the
    * wire (DSIR vocab stats, BM25 df). Null array → null. */
  final case class TokenCounts(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
      with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType =
      MapType(StringType, LongType, valueContainsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "token_counts"

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return null
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val m = new java.util.LinkedHashMap[
        org.apache.spark.unsafe.types.UTF8String, Long](2 * n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val t = arr.getUTF8String(i)
          val c = m.get(t)
          m.put(t, if (c == null) 1L else c + 1L)
        }
        i += 1
      }
      val keys = new Array[Any](m.size)
      val vals = new Array[Any](m.size)
      val it = m.entrySet().iterator()
      var k = 0
      while (it.hasNext) {
        val e = it.next(); keys(k) = e.getKey; vals(k) = e.getValue; k += 1
      }
      new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        new GenericArrayData(keys), new GenericArrayData(vals))
    }

    override protected def withNewChildInternal(newChild: Expression): TokenCounts =
      copy(child = newChild)
  }

  /** Per-row consecutive-bigram multiplicity: array<string> →
    * array<struct<p, c, n>> with one entry per DISTINCT (prev, cur)
    * pair (first-occurrence order) and n its in-row count — the bigram
    * analog of [[TokenCounts]], collapsing the per-occurrence
    * posexplode stream before it ever shuffles. Tokens come from a
    * whitespace split, so the internal "p c" dedup key is unambiguous.
    * Fewer than 2 tokens → empty array (explode then drops the row,
    * matching the size-filter + posexplode form). Null → null. */
  final case class BigramCounts(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
      with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("p", StringType), StructField("c", StringType),
      StructField("n", LongType, nullable = false))), containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "bigram_counts"

    private val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return null
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val idx = new java.util.LinkedHashMap[
        org.apache.spark.unsafe.types.UTF8String, Integer](2 * n)
      val ps = new scala.collection.mutable.ArrayBuffer[
        org.apache.spark.unsafe.types.UTF8String](n)
      val cs = new scala.collection.mutable.ArrayBuffer[
        org.apache.spark.unsafe.types.UTF8String](n)
      val cnts = new scala.collection.mutable.ArrayBuffer[Long](n)
      var i = 0
      while (i < n - 1) {
        val p = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
        val c = if (arr.isNullAt(i + 1)) null else arr.getUTF8String(i + 1)
        val key = org.apache.spark.unsafe.types.UTF8String.concatWs(sep, p, c)
        val at = idx.get(key)
        if (at == null) {
          idx.put(key, cnts.length); ps += p; cs += c; cnts += 1L
        } else cnts(at) += 1L
        i += 1
      }
      val out = new Array[Any](cnts.length)
      var k = 0
      while (k < out.length) {
        out(k) = InternalRow(ps(k), cs(k), cnts(k)); k += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): BigramCounts =
      copy(child = newChild)
  }

  /** Canonical text cleanup for corpus curation, one pass over the
    * string: Unicode NFC normalization, format characters (Cf — zero
    * widths, BOM, bidi marks) removed, every run of separator/control
    * characters (Z* ∪ Cc — including NBSP, which `\s` misses)
    * collapsed to a single ASCII space, edges trimmed, optional
    * ROOT-locale lowercase. The same rule a SQL engine expresses as
    * `lower(trim(regexp_replace(regexp_replace(nfc_normalize(s),
    * '[\p{Cf}]', '', 'g'), '[\p{Z}\p{Cc}]+', ' ', 'g')))`, which is
    * what the t29 oracle replays. Interpreted eval (string codec work,
    * same as [[BigramRepetition]]); null in → null out. */
  final case class NormalizeText(child: Expression, lowercase: Boolean)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
      with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def prettyName: String = "normalize_text"

    override protected def nullSafeEval(v: Any): Any = {
      val s = java.text.Normalizer.normalize(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString,
        java.text.Normalizer.Form.NFC)
      val sb = new java.lang.StringBuilder(s.length)
      var pendingSpace = false
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        java.lang.Character.getType(cp) match {
          case java.lang.Character.FORMAT => // Cf: drop, keep pending state
          case java.lang.Character.CONTROL | java.lang.Character.SPACE_SEPARATOR |
               java.lang.Character.LINE_SEPARATOR | java.lang.Character.PARAGRAPH_SEPARATOR =>
            pendingSpace = sb.length > 0 // leading runs vanish (trim)
          case _ =>
            if (pendingSpace) { sb.append(' '); pendingSpace = false }
            sb.appendCodePoint(
              if (lowercase) java.lang.Character.toLowerCase(cp) else cp)
        }
        i += java.lang.Character.charCount(cp)
      }
      org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
    }

    override protected def withNewChildInternal(newChild: Expression): NormalizeText =
      copy(child = newChild)
  }

  /** Count of positions where two long arrays hold equal values —
    * the MinHash Jaccard estimate's numerator, as one codegen'd loop
    * instead of k `element_at` equality terms. Null on length
    * mismatch (malformed signatures must surface). */
  final case class LongArrayMatchCount(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def prettyName: String = "array_match_count"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return null
      var c = 0
      var i = 0
      while (i < n) {
        if (x.getLong(i) == y.getLong(i)) c += 1
        i += 1
      }
      c
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val c = ctx.freshName("c")
        s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $c = 0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.getLong($i) == $b.getLong($i)) $c++;
          }
          ${ev.value} = $c;
        }
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): LongArrayMatchCount =
      copy(left = newLeft, right = newRight)
  }
}
