package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

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

/** 64-bit SimHash over pre-hashed tokens, returned as 4×16-bit chunk
  * values (the chunk-bucketing shape). Bit b of the signature is the
  * sign of Σ_tokens (bit b set ? +1 : −1).
  */
case class SimHashChunks(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

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
    val chunks = new Array[Long](4)
    var c = 0
    while (c < 4) {
      var v = 0L
      var b = 15
      while (b >= 0) {
        v = v * 2 + (if (votes(c * 16 + b) > 0) 1L else 0L)
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

object Signatures {
  def simhash_chunks(tokenHashes: Column): Column =
    ExpressionUtils.column(SimHashChunks(ExpressionUtils.expression(tokenHashes)))

  def minhash_signature(shingleHashes: Column, numHashes: Int): Column =
    ExpressionUtils.column(
      MinHashSignature(ExpressionUtils.expression(shingleHashes), numHashes))

  def token_hashes(tokens: Column): Column =
    ExpressionUtils.column(TokenHashes(ExpressionUtils.expression(tokens)))

  def shingle_hashes(tokens: Column, n: Int): Column =
    ExpressionUtils.column(ShingleHashes(ExpressionUtils.expression(tokens), n))
}
