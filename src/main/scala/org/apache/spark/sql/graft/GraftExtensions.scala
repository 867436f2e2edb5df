package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the engine's native expressions as SQL functions, so
  * `spark.sql("SELECT dot_product(a, b) ...")` works anywhere the
  * Column API does. Enable with either
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *
  * or `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** A literal-int argument (e.g. shingle n, hash count): require a
    * foldable expression up front — eval on a non-foldable child throws
    * an obscure error deep in planning — and accept any integral literal
    * (SQL integer literals arrive as Int, but a BIGINT literal is Long).
    */
  private def literalInt(e: Expression, fn: String, arg: String): Int = {
    if (!e.foldable) {
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_3055",
        messageParameters = Map("scanType" ->
          s"$fn: argument '$arg' must be a literal integer, got: ${e.sql}"))
    }
    e.eval() match {
      case n: Number => n.intValue()
      case other =>
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "_LEGACY_ERROR_TEMP_3055",
          messageParameters = Map("scanType" ->
            s"$fn: argument '$arg' must be a literal integer, got: $other"))
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two array<double> columns"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("token_hashes"),
      info("token_hashes", "token_hashes(tokens) - XXH64 of each token string"),
      (children: Seq[Expression]) => TokenHashes(children.head)))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(tokens, n) - distinct word n-gram hashes"),
      (children: Seq[Expression]) => ShingleHashes(children(0),
        literalInt(children(1), "shingle_hashes", "n"))))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(shingleHashes, k) - k-min MinHash signature"),
      (children: Seq[Expression]) => MinHashSignature(children(0),
        literalInt(children(1), "minhash_signature", "k"))))
    ext.injectFunction((
      FunctionIdentifier("simhash_chunks"),
      info("simhash_chunks", "simhash_chunks(tokenHashes) - 64-bit SimHash as 4x16-bit chunks"),
      (children: Seq[Expression]) => SimHashChunks(children.head)))
  }
}
