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
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

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
      info("simhash_chunks", "simhash_chunks(tokenHashes[, nChunks]) - 64-bit SimHash as nChunks chunks"),
      (children: Seq[Expression]) =>
        if (children.length > 1)
          SimHashChunks(children.head, literalInt(children(1), "simhash_chunks", "nChunks"))
        else SimHashChunks(children.head)))
    ext.injectFunction((
      FunctionIdentifier("hamming_distance"),
      info("hamming_distance", "hamming_distance(a, b) - popcount of XOR over two array<long> signatures"),
      (children: Seq[Expression]) => HammingDistance(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("jaccard_longs"),
      info("jaccard_longs", "jaccard_longs(a, b) - exact Jaccard of two array<long> hash sets"),
      (children: Seq[Expression]) => JaccardLongs(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_bands"),
      info("hyperplane_bands", "hyperplane_bands(vec, bands, rowsPerBand, seed) - sign-random-projection LSH bands"),
      (children: Seq[Expression]) => HyperplaneBands(children(0),
        literalInt(children(1), "hyperplane_bands", "bands"),
        literalInt(children(2), "hyperplane_bands", "rowsPerBand"),
        literalInt(children(3), "hyperplane_bands", "seed").toLong)))
    ext.injectFunction((
      FunctionIdentifier("winnow_keys"),
      info("winnow_keys", "winnow_keys(tokens, k, w) - winnowed MOSS fingerprint keys (k-gram md5 prefix, window-of-w rightmost-min)"),
      (children: Seq[Expression]) => WinnowKeys(children(0),
        literalInt(children(1), "winnow_keys", "k"),
        literalInt(children(2), "winnow_keys", "w"))))
  }
}
