package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector-similarity operators over an `array<float>` embedding column.
  *
  * All arithmetic is promoted to double *per element* before any
  * accumulation (float accumulation drifts and breaks cross-engine
  * parity). Dot products are pure Column expressions (codegen'd).
  *
  * Scale path: brute force is the correctness baseline (O(Q·N) with Q
  * broadcast); IVF coarse quantization keeps the same top-k API but
  * probes only the query's cell — the shuffle is keyed by centroid id,
  * so a 1000-executor cluster partitions the index naturally.
  */
object Similarity {

  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Brute-force cosine top-k: for each query vector (a small broadcast
    * side), the k nearest neighbors among all vectors (excluding self).
    * One broadcast join + one shuffle for the per-query top-k window.
    */
  def bruteForceTopK(
      vectors: DataFrame, // (vec_id, embedding)
      queries: DataFrame, // (vec_id, embedding) — small
      k: Int): DataFrame = {
    val v = vectors.select(col("vec_id").as("nid"), asDouble(col("embedding")).as("nv"))
    val q = queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
    val scored = v.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** All vector pairs with cosine ≥ threshold (embedding near-dup).
    * Brute force O(N²) — the exactness baseline; callers at scale use
    * [[ivfTopK]]-style cell blocking first.
    */
  def nearDupPairs(vectors: DataFrame, threshold: Double): DataFrame = {
    val a = vectors.select(col("vec_id").as("i"), asDouble(col("embedding")).as("va"))
    val b = vectors.select(col("vec_id").as("j"), asDouble(col("embedding")).as("vb"))
    a.join(b, col("i") < col("j"))
      .select(col("i"), col("j"), cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** IVF-style approximate top-k: coarse-quantize every vector to its
    * nearest centroid (centroids = a small deterministic seed set, e.g.
    * the first C vectors), then search only within the query's cell.
    * Deterministic given the centroid set, so it has an exact SQL mirror.
    */
  def ivfTopK(
      vectors: DataFrame,
      queries: DataFrame,
      centroids: DataFrame, // (cid, embedding) — small, broadcast
      k: Int): DataFrame = {
    val c = centroids.select(col("cid"), asDouble(col("embedding")).as("cv"))

    def assignCell(df: DataFrame, idName: String, vecName: String): DataFrame =
      df.join(broadcast(c), lit(true))
        .select(col(idName), col(vecName), col("cid"),
          cosine(col(vecName), col("cv")).as("csim"))
        .withColumn("rk",
          row_number().over(
            Window.partitionBy(col(idName)).orderBy(col("csim").desc, col("cid").asc)))
        .filter(col("rk") === 1)
        .select(col(idName), col(vecName), col("cid").as("cell"))

    val v = assignCell(
      vectors.select(col("vec_id").as("nid"), asDouble(col("embedding")).as("nv")),
      "nid", "nv")
    val q = assignCell(
      queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv")),
      "qid", "qv")
    val scored = v.join(broadcast(q), col("qid") =!= col("nid") &&
        v("cell") === q("cell"))
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
