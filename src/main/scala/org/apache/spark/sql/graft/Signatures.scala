package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, LongType, StructType}

/** Native signature kernels for the dedup operators.
  *
  * Both consume an `array<long>` of pre-hashed tokens/shingles (hash the
  * string exactly once, upstream) and run tight primitive loops — the
  * Column-expression formulations (`aggregate`+`zip_with`+`bit_get`)
  * are interpreted HigherOrderFunctions costing ~µs per element-step,
  * which turned the sf0.1 near-dup queries into minutes. CodegenFallback
  * is fine here: the eval itself is a compiled JVM loop; only the call
  * boundary is interpreted.
  */

/** 64-bit SimHash over pre-hashed tokens, returned as `nChunks` equal
  * chunk values (the chunk-bucketing shape; 64 must divide evenly).
  * Bit b of the signature is the sign of Σ_tokens (bit b set ? +1 : −1).
  * Pigeonhole: two signatures within hamming distance nChunks−1 share
  * at least one identical chunk, so chunk-equality buckets are a
  * complete candidate generator up to that radius.
  */
case class SimHashChunks(child: Expression, nChunks: Int = 4)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(64 % nChunks == 0, s"nChunks must divide 64, got $nChunks")
  private val chunkBits = 64 / nChunks

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "simhash_chunks"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    val chunks = new Array[Long](nChunks)
    var c = 0
    while (c < nChunks) {
      var v = 0L
      var b = chunkBits - 1
      while (b >= 0) {
        v = v * 2 + (if (votes(c * chunkBits + b) > 0) 1L else 0L)
        b -= 1
      }
      chunks(c) = v
      c += 1
    }
    new GenericArrayData(chunks)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashChunks =
    copy(child = newChild)
}

/** Codegen'd hamming distance between two `array<long>` signatures
  * (chunked or packed — chunk boundaries don't change the popcount).
  * Replaces the interpreted aggregate(zip_with(bit_count(xor)))
  * HigherOrderFunction that dominated the near-dup join condition.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0
    var i = 0
    while (i < n) {
      s += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $s = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

/** Exact Jaccard similarity of two `array<long>` hash sets via
  * sort-and-merge — one compiled loop per pair. The Column formulation
  * (size(array_intersect)/size(array_union)) walks interpreted
  * collection builders per candidate pair and dominated the near-dup
  * verify stage. Inputs are treated as sets (ShingleHashes already
  * emits distinct hashes).
  */
case class JaccardLongs(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_longs"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toLongArray()
    val y = b.asInstanceOf[ArrayData].toLongArray()
    java.util.Arrays.sort(x)
    java.util.Arrays.sort(y)
    var i = 0
    var j = 0
    var inter = 0
    while (i < x.length && j < y.length) {
      if (x(i) == y(j)) { inter += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    val union = x.length + y.length - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardLongs =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane (sign-random-projection) LSH bands over an
  * `array<double>` vector: bit k is the sign of ⟨v, h_k⟩ where h_k is a
  * deterministic Rademacher (±1) vector derived from XXH64(seed, k, d).
  * Returns `bands` values of `rowsPerBand` bits each — the
  * equi-joinable banding shape (P[bit collision] = 1 − θ/π, the
  * SimHash/ Charikar scheme over real vectors). The ±1 matrix is built
  * once per (shape, seed) per executor and cached.
  */
case class HyperplaneBands(
    child: Expression, bands: Int, rowsPerBand: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "hyperplane_bands"

  @transient private lazy val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Double]]]()

  private def planes(d: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent(d, { _ =>
      val nBits = bands * rowsPerBand
      Array.tabulate(nBits, d) { (k, dim) =>
        if ((XXH64.hashLong(k.toLong * 1000003L + dim, seed) & 1L) == 1L) 1.0 else -1.0
      }
    })

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = v.numElements()
    val vec = new Array[Double](d)
    var dim = 0
    while (dim < d) { vec(dim) = v.getDouble(dim); dim += 1 }
    val pl = planes(d)
    val out = new Array[Long](bands)
    var band = 0
    while (band < bands) {
      var value = 0L
      var j = 0
      while (j < rowsPerBand) {
        val row = pl(band * rowsPerBand + j)
        var s = 0.0
        var i = 0
        while (i < d) { s += row(i) * vec(i); i += 1 }
        value = value * 2 + (if (s > 0) 1L else 0L)
        j += 1
      }
      out(band) = value
      band += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}

/** MinHash signature over pre-hashed shingles: k minima of
  * XXH64(shingleHash, seed=i) — the "permutations" are seeded rehashes
  * of the 8-byte shingle hash, never of the original string.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val sig = Array.fill[Long](numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var k = 0
      while (k < numHashes) {
        val v = XXH64.hashLong(h, k.toLong)
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Hash every token string once (XXH64 over its UTF-8 bytes). */
case class TokenHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "token_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      out(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
}

/** Distinct hashes of the word n-gram shingles of a token array —
  * tokens are hashed once, each shingle hash is the XXH64 chain of its
  * n token hashes, so no shingle string is ever materialized. Set
  * semantics match distinct string shingles up to a ~2⁻⁶⁴ collision.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val nTok = toks.numElements()
    if (nTok < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      val s = toks.getUTF8String(i)
      th(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](nTok - n + 1)
    i = 0
    while (i <= nTok - n) {
      var h = 0x9e3779b97f4a7c15L
      var j = 0
      while (j < n) {
        h = XXH64.hashLong(th(i + j), h)
        j += 1
      }
      if (seen.add(h)) out += h
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Sparse dot product of two TERM-SORTED sparse vectors held as
  * PARALLEL arrays (`terms array<string>` + `ws array<double>`, same
  * length, sorted by term) via sorted-merge — one compiled loop per
  * candidate pair (the JaccardLongs shape, keyed by string terms).
  * Products accumulate in ascending binary term order, which makes the
  * result symmetric in its argument pairs AND bit-identical to a
  * sequential fold over the shared terms in sorted order — the
  * cross-engine float discipline. Parallel primitive-backed arrays
  * beat `array<struct<term,w>>` here: getStruct materializes an
  * UnsafeRow wrapper PER ELEMENT PER PAIR (billions of short-lived
  * allocations on a quadratic candidate set), while parallel arrays
  * read through flat offsets. Duplicate terms within one side are not
  * merged — feed one entry per term.
  */
case class SparseDot(
    termsA: Expression, wsA: Expression,
    termsB: Expression, wsB: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(termsA, wsA, termsB, wsB)
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sparse_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val want = Seq(
      ArrayType(org.apache.spark.sql.types.StringType), ArrayType(DoubleType),
      ArrayType(org.apache.spark.sql.types.StringType), ArrayType(DoubleType))
    val got = children.map(_.dataType)
    if (got.zip(want).forall { case (g, w) => w.acceptsType(g) })
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<string>, array<double>) × 2, " +
        s"got ${got.map(_.catalogString).mkString(", ")}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val ta = termsA.eval(input)
    val va = wsA.eval(input)
    val tb = termsB.eval(input)
    val vb = wsB.eval(input)
    if (ta == null || va == null || tb == null || vb == null) return null
    val xt = ta.asInstanceOf[ArrayData]
    val xw = va.asInstanceOf[ArrayData]
    val yt = tb.asInstanceOf[ArrayData]
    val yw = vb.asInstanceOf[ArrayData]
    val nx = xt.numElements()
    val ny = yt.numElements()
    var i = 0
    var j = 0
    var s = 0.0
    while (i < nx && j < ny) {
      val c = xt.getUTF8String(i).compareTo(yt.getUTF8String(j))
      if (c == 0) {
        s += xw.getDouble(i) * yw.getDouble(j)
        i += 1; j += 1
      } else if (c < 0) i += 1
      else j += 1
    }
    s
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SparseDot =
    copy(termsA = newChildren(0), wsA = newChildren(1),
      termsB = newChildren(2), wsB = newChildren(3))
}

/** Winnowed fingerprint keys (Schleimer/Wilkerson/Aho 2003) over a
  * token array: k-gram md5-prefix keys, window-of-w minima (ties to
  * the rightmost position via the appended descending position
  * suffix), distinct, first-occurrence order. Key layout —
  * `md5(gram)[0..11] ∥ lpad(32767 − pos, 5, '0')` — is byte-for-byte
  * the SQL formulation's, so the DuckDB window-min oracle reproduces
  * the selection verbatim.
  *
  * A native kernel rather than nested higher-order Columns for the
  * same reason as the rest of this file, plus one more: staged
  * HOF projections are re-merged by PREDICATE PUSHDOWN (constraint
  * inference inlines the full nested tree into a per-row filter,
  * where the innermost lambda re-evaluates tokenize/md5 per window —
  * O(m³) interpreted; measured 114 s vs 2 s on the sf0.1 corpus).
  * Here the whole selection is one compiled O(m·(k+w)) loop that any
  * number of optimizer inlinings keeps linear.
  */
case class WinnowKeys(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(k >= 1 && w >= 1, s"bad winnow config: k=$k w=$w")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType)
  override def prettyName: String = "winnow_keys"

  @transient private lazy val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    // The 5-digit position tiebreaker encodes 32767-i; beyond 32768
    // grams it would go negative and break the fixed-width
    // lexicographic-min invariant, so gram processing truncates there
    // (documents past ~32k tokens keep their prefix fingerprints).
    val m = math.min(n - k + 1, 32768)
    if (n < k || m < w) return new GenericArrayData(Array.empty[Any])
    val md = mdLocal.get()
    val keys = new Array[String](m)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      md.reset()
      val dig = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val key = new java.lang.StringBuilder(17)
      var b = 0
      while (b < 6) {
        val v = dig(b) & 0xff
        key.append(Character.forDigit(v >>> 4, 16))
        key.append(Character.forDigit(v & 15, 16))
        b += 1
      }
      val ps = Integer.toString(32767 - i)
      var z = 5 - ps.length
      while (z > 0) { key.append('0'); z -= 1 }
      key.append(ps)
      keys(i) = key.toString
      i += 1
    }
    val sel = new java.util.LinkedHashSet[String]()
    var s = 0
    while (s <= m - w) {
      var mn = keys(s)
      var t = s + 1
      while (t < s + w) {
        if (keys(t).compareTo(mn) < 0) mn = keys(t)
        t += 1
      }
      sel.add(mn)
      s += 1
    }
    val out = new Array[Any](sel.size)
    val it = sel.iterator()
    var oi = 0
    while (it.hasNext) {
      out(oi) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      oi += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowKeys =
    copy(child = newChild)
}

/** Greedy BPE merge application over a symbol stream: for each learned
  * merge (a, b) in priority order, ONE left-to-right pass replaces
  * non-overlapping adjacent (a, b) occurrences with the joined symbol
  * "a b" (tokens contain no spaces, so the space join is unambiguous
  * and later merges can reference merged symbols). A compiled loop for
  * the same reasons as [[WinnowKeys]]; the equivalent left-fold
  * ("merge when last(out)=a ∧ cur=b") is what the SQL oracle runs —
  * both are greedy leftmost non-overlapping, proven equal by the
  * training spec.
  */
case class BpeApplyMerges(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType)
  override def prettyName: String = "bpe_apply_merges"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    var cur = new java.util.ArrayList[String](n)
    var i = 0
    while (i < n) { cur.add(toks.getUTF8String(i).toString); i += 1 }
    merges.foreach { case (a, b) =>
      val out = new java.util.ArrayList[String](cur.size)
      var j = 0
      while (j < cur.size) {
        if (j + 1 < cur.size && cur.get(j) == a && cur.get(j + 1) == b) {
          out.add(a + " " + b); j += 2
        } else { out.add(cur.get(j)); j += 1 }
      }
      cur = out
    }
    val outArr = new Array[Any](cur.size)
    var k = 0
    while (k < cur.size) {
      outArr(k) = org.apache.spark.unsafe.types.UTF8String
        .fromString(cur.get(k))
      k += 1
    }
    new GenericArrayData(outArr)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeApplyMerges = copy(child = newChild)
}

/** Hilbert-curve index of an (x, y) cell on the 2^bits × 2^bits grid
  * (the standard per-bit quadrant-rotation formulation of the xy2d
  * mapping). Unlike Morton, CONSECUTIVE indices are always
  * edge-adjacent cells (|Δx|+|Δy| = 1), so a contiguous index range —
  * one file under range-partitioned clustering — covers a tighter
  * region: measurably better min/max pruning for the same file count.
  *
  * A native expression rather than Column algebra because the per-bit
  * rotation feeds BOTH coordinates of step b into step b−1: unrolled
  * `when()` chains duplicate the (x, y) subtrees at every level and
  * Catalyst's project collapse makes the expression tree grow ~2^bits.
  * Here it is a 16-iteration compiled loop under whole-stage codegen.
  * Inputs must already lie on the lattice (0 ≤ v < 2^bits) — callers
  * normalize exactly like the Morton path.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a; long $y = $b; long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

/** Count of elements strictly below `value` in a SORTED ascending
  * `array<double>` — the equi-depth range-ID lookup (row value →
  * quantile bucket against broadcast percentile cuts). Binary search:
  * log₂(cuts) compares per row where the equivalent
  * `size(filter(cuts, c => v > c))` HigherOrderFunction walks all
  * cuts interpreted, one lambda invocation per element — measured
  * 40.5 s → sub-second on q179's 255-cut × 600k-row assignment.
  * Exactly equivalent to the linear count ONLY on sorted input
  * (percentile output is monotone by construction).
  */
case class LowerBound(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), DoubleType)
  override def dataType: DataType = LongType
  override def prettyName: String = "lower_bound"

  override protected def nullSafeEval(arr: Any, v: Any): Any = {
    val cuts = arr.asInstanceOf[ArrayData]
    val x = v.asInstanceOf[Double]
    var lo = 0
    var hi = cuts.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts.getDouble(mid) < x) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, v) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $arr.numElements();
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($arr.getDouble($mid) < $v) $lo = $mid + 1; else $hi = $mid;
         |}
         |${ev.value} = (long) $lo;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LowerBound =
    copy(left = newLeft, right = newRight)
}

object Signatures {
  def hilbert_index(x: Column, y: Column, bits: Int): Column =
    ExpressionUtils.column(
      HilbertIndex(ExpressionUtils.expression(x),
        ExpressionUtils.expression(y), bits))

  def lower_bound(sortedCuts: Column, value: Column): Column =
    ExpressionUtils.column(
      LowerBound(ExpressionUtils.expression(sortedCuts),
        ExpressionUtils.expression(value)))

  def bpe_apply(tokens: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(
      BpeApplyMerges(ExpressionUtils.expression(tokens), merges))

  def winnow_keys(tokens: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowKeys(ExpressionUtils.expression(tokens), k, w))

  def simhash_chunks(tokenHashes: Column, nChunks: Int = 4): Column =
    ExpressionUtils.column(
      SimHashChunks(ExpressionUtils.expression(tokenHashes), nChunks))

  def hamming_distance(a: Column, b: Column): Column =
    ExpressionUtils.column(
      HammingDistance(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def jaccard_longs(a: Column, b: Column): Column =
    ExpressionUtils.column(
      JaccardLongs(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def hyperplane_bands(vec: Column, bands: Int, rowsPerBand: Int, seed: Long): Column =
    ExpressionUtils.column(
      HyperplaneBands(ExpressionUtils.expression(vec), bands, rowsPerBand, seed))

  def minhash_signature(shingleHashes: Column, numHashes: Int): Column =
    ExpressionUtils.column(
      MinHashSignature(ExpressionUtils.expression(shingleHashes), numHashes))

  def token_hashes(tokens: Column): Column =
    ExpressionUtils.column(TokenHashes(ExpressionUtils.expression(tokens)))

  def shingle_hashes(tokens: Column, n: Int): Column =
    ExpressionUtils.column(ShingleHashes(ExpressionUtils.expression(tokens), n))

  def sparse_dot(termsA: Column, wsA: Column, termsB: Column, wsB: Column): Column =
    ExpressionUtils.column(
      SparseDot(ExpressionUtils.expression(termsA), ExpressionUtils.expression(wsA),
        ExpressionUtils.expression(termsB), ExpressionUtils.expression(wsB)))
}
