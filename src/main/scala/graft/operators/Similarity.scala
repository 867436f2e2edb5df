package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.DotProduct.dot_product

/** Vector-similarity operators over an `array<float>` embedding column.
  *
  * All arithmetic is promoted to double *per element* before any
  * accumulation (float accumulation drifts and breaks cross-engine
  * parity). The per-pair kernel is the codegen'd DotProduct expression
  * (org.apache.spark.sql.graft), and every vector's norm is computed
  * once up front — the
  * pairwise stage does exactly one primitive loop per pair.
  *
  * Scale path: brute force is the correctness baseline (O(Q·N) with Q
  * broadcast); IVF coarse quantization keeps the same top-k API but
  * probes only the query's cell — the shuffle is keyed by centroid id,
  * so a 1000-executor cluster partitions the index naturally.
  */
object Similarity {

  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column = dot_product(a, b)

  def l2norm(a: Column): Column = sqrt(dot_product(a, a))

  def cosine(a: Column, b: Column): Column =
    dot_product(a, b) / (l2norm(a) * l2norm(b))

  /** (id, vec, nrm) projection with the norm evaluated once per vector. */
  private def normed(df: DataFrame, idOut: String, vecOut: String): DataFrame =
    df.select(col("vec_id").as(idOut), asDouble(col("embedding")).as(vecOut))
      .withColumn(vecOut + "_nrm", l2norm(col(vecOut)))

  /** Brute-force cosine top-k: for each query vector (a small broadcast
    * side), the k nearest neighbors among all vectors (excluding self).
    * One broadcast join + one shuffle for the per-query top-k window.
    */
  def bruteForceTopK(
      vectors: DataFrame, // (vec_id, embedding)
      queries: DataFrame, // (vec_id, embedding) — small
      k: Int): DataFrame = {
    val v = normed(vectors, "nid", "nv")
    val q = normed(queries, "qid", "qv")
    val scored = v.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dot_product(col("qv"), col("nv")) / (col("qv_nrm") * col("nv_nrm"))).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** All vector pairs with cosine ≥ threshold (embedding near-dup).
    * Brute force O(N²) — the exactness baseline; callers at scale use
    * [[ivfTopK]]-style cell blocking first.
    */
  def nearDupPairs(vectors: DataFrame, threshold: Double): DataFrame = {
    val a = normed(vectors, "i", "va")
    val b = normed(vectors, "j", "vb")
    a.join(b, col("i") < col("j"))
      .select(col("i"), col("j"),
        (dot_product(col("va"), col("vb")) / (col("va_nrm") * col("vb_nrm"))).as("cos"))
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
      .withColumn("cnrm", l2norm(col("cv")))

    def assignCell(df: DataFrame, idName: String, vecName: String): DataFrame =
      df.join(broadcast(c), lit(true))
        .select(col(idName), col(vecName), col(vecName + "_nrm"), col("cid"),
          (dot_product(col(vecName), col("cv")) / (col(vecName + "_nrm") * col("cnrm")))
            .as("csim"))
        .withColumn("rk",
          row_number().over(
            Window.partitionBy(col(idName)).orderBy(col("csim").desc, col("cid").asc)))
        .filter(col("rk") === 1)
        .select(col(idName), col(vecName), col(vecName + "_nrm"), col("cid").as("cell"))

    val v = assignCell(normed(vectors, "nid", "nv"), "nid", "nv")
    val q = assignCell(normed(queries, "qid", "qv"), "qid", "qv")
    val scored = v.join(broadcast(q), col("qid") =!= col("nid") &&
        v("cell") === q("cell"))
      .select(col("qid"), col("nid"),
        (dot_product(col("qv"), col("nv")) / (col("qv_nrm") * col("nv_nrm"))).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
