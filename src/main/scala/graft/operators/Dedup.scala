package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, designed for
  * the 100 TB regime:
  *
  *  - exact dedup: one shuffle on the text (or a hash of it);
  *  - MinHash + LSH banding: near-dup candidate generation whose cost is
  *    O(docs · shingles · hashes) map-side plus a shuffle keyed by
  *    (band, band-signature) — candidate pairs are verified with exact
  *    Jaccard so the output is deterministic (no probabilistic output,
  *    only probabilistic *work*);
  *  - SimHash: 64-bit weighted-bit signature, bucketed by 16-bit chunks
  *    (pigeonhole guarantees recall for hamming ≤ 3 with 4 chunks).
  *
  * Signature hashing uses xxhash64 (codegen'd, seeded per hash index by
  * passing the index as a leading column) — never a Python/Scala UDF.
  */
object Dedup {

  /** Exact duplicate groups: keeper (min id) + duplicate count per
    * distinct text. At scale, group by xxhash64(text) first and only
    * compare full texts within a hash bucket; at these SFs grouping by
    * the text itself is one shuffle either way.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** Distinct word n-gram shingles of a text column. */
  def shingles(text: Column, n: Int): Column = {
    val w = split(text, " ")
    array_distinct(
      transform(sequence(lit(0), size(w) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*)))
  }

  /** MinHash signature: k minimums of per-shingle xxhash64 values, the
    * hash "permutation" selected by a leading index column.
    */
  def minhashSignature(sh: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(sh, s => xxhash64(i, s))))

  /** Exact Jaccard similarity of two array columns (set semantics). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Near-duplicate pairs by MinHash LSH with exact-Jaccard verification.
    *
    * Plan shape (scales linearly in documents):
    *   1. map: shingles → k-hash signature → b band keys per doc
    *   2. shuffle 1: self-join on (band, bandSig) → candidate pairs
    *   3. shuffle 2: re-attach shingle sets, exact Jaccard, filter ≥ τ
    *
    * Banding parameters (k=64, b=16, r=4) give miss probability
    * (1−s⁴)¹⁶ ≈ 3·10⁻¹⁸ at s=0.98 — deterministic in practice, so the
    * output equals brute-force Jaccard ≥ τ (which is the oracle).
    */
  def minhashLsh(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7): DataFrame = {
    val rows = numHashes / bands
    val withSig = df
      .select(col(idCol).as("doc_id"), shingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    val banded = withSig.select(
      col("doc_id"),
      posexplode(
        transform(sequence(lit(0), lit(bands - 1)), b =>
          slice(col("sig"), b * rows + 1, lit(rows)))).as(Seq("band", "bandsig")))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bandsig") === col("b.bandsig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()
    val sh = withSig.select(col("doc_id"), col("sh"))
    cand
      .join(sh.withColumnRenamed("doc_id", "i").withColumnRenamed("sh", "sh_i"), "i")
      .join(sh.withColumnRenamed("doc_id", "j").withColumnRenamed("sh", "sh_j"), "j")
      .withColumn("jac", jaccard(col("sh_i"), col("sh_j")))
      .filter(col("jac") >= threshold)
      .select(col("i"), col("j"), col("jac"))
  }

  /** 64-bit SimHash of the token sequence: bit b of the signature is the
    * sign of Σ_tokens (bit b of xxhash64(token) ? +1 : −1).
    * Returned as an array of 4 16-bit chunk values (long) — the natural
    * shape for chunk-bucketed near-dup search.
    */
  def simhashChunks(text: Column): Column = {
    val toks = split(text, " ")
    // per-bit vote counts: fold tokens into a 64-slot vector
    val votes = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) =>
        zip_with(acc, sequence(lit(0), lit(63)), (a, b) =>
          a + when(bit_get(xxhash64(t), b) === 1, lit(1)).otherwise(lit(-1))))
    // pack sign bits into 4 × 16-bit chunks (MSB-first doubling fold)
    transform(sequence(lit(0), lit(3)), c =>
      aggregate(sequence(lit(15), lit(0), lit(-1)), lit(0L), (acc, b) =>
        acc * 2 + when(element_at(votes, (c * 16 + b + 1).cast("int")) > 0,
          lit(1L)).otherwise(lit(0L))))
  }

  /** Hamming distance between two chunked simhash signatures. */
  def hammingChunks(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, x) => acc + x)

  /** Near-duplicate pairs by SimHash chunk bucketing + exact-Jaccard
    * verification. Candidates must share ≥1 of the 4 16-bit chunks
    * (pigeonhole: guaranteed for hamming ≤ 3); verification makes the
    * output exact w.r.t. the Jaccard threshold among those candidates.
    */
  def simhashNearDup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      threshold: Double = 0.7): DataFrame = {
    val base = df.select(
      col(idCol).as("doc_id"),
      shingles(col(textCol), shingleN).as("sh"),
      simhashChunks(col(textCol)).as("sig"))
      .filter(size(col("sh")) > 0)
    val buckets = base.select(
      col("doc_id"),
      posexplode(col("sig")).as(Seq("chunk", "chunkval")))
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.chunk") === col("b.chunk") &&
          col("a.chunkval") === col("b.chunkval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()
    val side = base.select(col("doc_id"), col("sh"), col("sig"))
    cand
      .join(side.select(col("doc_id").as("i"), col("sh").as("sh_i"), col("sig").as("sig_i")), "i")
      .join(side.select(col("doc_id").as("j"), col("sh").as("sh_j"), col("sig").as("sig_j")), "j")
      .withColumn("hamming", hammingChunks(col("sig_i"), col("sig_j")))
      .withColumn("jac", jaccard(col("sh_i"), col("sh_j")))
      .filter(col("jac") >= threshold)
      .select(col("i"), col("j"), col("jac"))
  }
}
