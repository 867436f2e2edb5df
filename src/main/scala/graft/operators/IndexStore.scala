package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN index: train ONCE, serve MANY — the lifecycle piece
  * that divorces query latency from index construction. Every serving
  * artifact of the relation-path IVF-PQ search is written as a plain
  * parquet relation:
  *
  *   dir/centroids — [[Similarity.centroidRelation]] schema
  *                   (cid, cv, cnrm, cn2), one row per coarse cell
  *   dir/codebooks — [[Similarity.codebookRelation]] schema
  *                   (sub, start, code, cv, cnrm, cn2)
  *   dir/codes     — the ENCODED corpus (vec_id, sub, code, cell) —
  *                   four ints per (vector, subspace), the only
  *                   corpus-sized artifact
  *   dir/meta      — one row (num_sub, w, num_cells, codebook_k)
  *
  * Parquet stores arrays of doubles and int64s exactly, so a served
  * result is BIT-IDENTICAL to the in-memory relation path (spec-pinned
  * by the round-trip equality in Round14OpsSpec) — which is itself
  * spec-identical to the literal path, so the store inherits the whole
  * family's oracle gates.
  *
  * Scale shape: the index relations are index-sized (never driver
  * literals — the L152 form), `codes` is corpus-sized but narrow and
  * column-pruned at the scan, and serving never touches the original
  * d-dim vectors. On a cluster the store is just a parquet directory:
  * build on one job, serve from any number of downstream jobs, refresh
  * via [[Similarity.ivfIndexMaintain]] + [[writeCentroids]] without
  * re-encoding unmoved codes.
  */
object IndexStore {

  /** Train the relation-path IVF-PQ index over `vectors` (vec_id,
    * embedding) and persist all four artifacts under `dir`. Training
    * is [[Similarity.ivfPqTopK]]'s relation path verbatim: Lloyd
    * coarse centroids (viaRelation — nothing index-sized in any plan),
    * per-subspace Lloyd codebooks, nearest-codeword encode via
    * broadcast codebook join.
    */
  def buildIvfPq(vectors: DataFrame, dir: String, numCells: Int,
      cellIters: Int, numSub: Int, codebookK: Int, pqIters: Int): Unit = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val coarse = Similarity.kmeansCentroidSeq(vectors, numCells, cellIters,
      viaRelation = true)
    val centRel = Similarity.centroidRelation(spark, coarse)
    val v = vectors.select(col("vec_id"),
      Similarity.asDouble(col("embedding")).as("v"))
    val memberCells = Similarity.assignCellsRelation(v, centRel, probes = 1)
      .select(col("vec_id"), col("cell"))
    val (w, books) = Similarity.pqCodebooks(vectors, numSub, codebookK,
      pqIters)
    val bookRel = Similarity.codebookRelation(spark, w, books)
    val codes = Similarity
      .encodeViaRelation(Similarity.subSliced(v, numSub, w), bookRel)
      .join(memberCells, "vec_id")
    centRel.write.mode("overwrite").parquet(s"$dir/centroids")
    bookRel.write.mode("overwrite").parquet(s"$dir/codebooks")
    codes.write.mode("overwrite").parquet(s"$dir/codes")
    Seq((numSub, w, numCells, codebookK))
      .toDF("num_sub", "w", "num_cells", "codebook_k")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Serve a top-k query batch from the persisted index — NO training,
    * no corpus-vector scan: probe assignment over the queries against
    * the stored centroid relation, then [[Similarity.ivfPqServe]] over
    * the stored code stream. `allowed` applies the filtered-ANN
    * allow-list (see ivfPqServe's scaladoc) before scoring.
    */
  def serveIvfPq(spark: SparkSession, dir: String, queries: DataFrame,
      k: Int, probes: Int, allowed: Option[DataFrame] = None): DataFrame = {
    val centRel = spark.read.parquet(s"$dir/centroids")
    val bookRel = spark.read.parquet(s"$dir/codebooks")
    val codes = spark.read.parquet(s"$dir/codes")
    val meta = spark.read.parquet(s"$dir/meta").head()
    val numSub = meta.getAs[Int]("num_sub")
    val w = meta.getAs[Int]("w")
    Similarity.ivfPqServe(codes, centRel, bookRel, queries, k, probes,
      numSub, w, allowed)
  }

  /** Persist a maintained centroid set (the output of
    * [[Similarity.ivfIndexMaintain]]) back into the store — the
    * refresh half of the index lifecycle. Codes/codebooks are
    * untouched: a coarse refresh moves cell BOUNDARIES, and the
    * follow-up re-encode of moved members is the incremental job the
    * drift readout (q181) sizes.
    */
  def writeCentroids(spark: SparkSession, dir: String,
      cent: Seq[(Long, Seq[Double])]): Unit =
    Similarity.centroidRelation(spark, cent)
      .write.mode("overwrite").parquet(s"$dir/centroids")

  /** Append an ingest batch to the persisted index WITHOUT retraining
    * (how a real system absorbs arrivals — new vectors go to their
    * nearest existing cell, encoded against the existing codebooks):
    * one broadcast assignment + encode over the BATCH only, appended
    * to the code stream. Staleness introduced here is exactly what the
    * q181 drift readout measures and the q186 maintain action repairs.
    */
  def appendVectors(vectors: DataFrame, dir: String): Unit = {
    val spark = vectors.sparkSession
    val centRel = spark.read.parquet(s"$dir/centroids")
    val bookRel = spark.read.parquet(s"$dir/codebooks")
    val meta = spark.read.parquet(s"$dir/meta").head()
    val numSub = meta.getAs[Int]("num_sub")
    val w = meta.getAs[Int]("w")
    val v = vectors.select(col("vec_id"),
      Similarity.asDouble(col("embedding")).as("v"))
    val cells = Similarity.assignCellsRelation(v, centRel, probes = 1)
      .select(col("vec_id"), col("cell"))
    Similarity.encodeViaRelation(Similarity.subSliced(v, numSub, w), bookRel)
      .join(cells, "vec_id")
      .select(col("vec_id"), col("sub"), col("code"), col("cell"))
      .write.mode("append").parquet(s"$dir/codes")
  }

  /** Membership refresh after [[writeCentroids]]: reassign every
    * vector to the REFRESHED stored centroids and rewrite the code
    * stream's `cell` column. sub/code stay — a coarse refresh moves
    * cell boundaries, not the PQ codebooks — so this is the cheap
    * half of maintenance: one map-side assignment over the vectors
    * plus a narrow codes rewrite, never a retrain. Staged write +
    * swap (the compactionRewrite discipline): the new codes land in
    * `codes_tmp`, are row-count-verified, then swapped in — a reader
    * never sees a half-written stream.
    */
  def reassignCells(vectors: DataFrame, dir: String): Unit = {
    val spark = vectors.sparkSession
    val centRel = spark.read.parquet(s"$dir/centroids")
    val v = vectors.select(col("vec_id"),
      Similarity.asDouble(col("embedding")).as("v"))
    val cells = Similarity.assignCellsRelation(v, centRel, probes = 1)
      .select(col("vec_id"), col("cell"))
    val oldCodes = spark.read.parquet(s"$dir/codes")
    val nOld = oldCodes.count()
    oldCodes.drop("cell").join(cells, "vec_id")
      .write.mode("overwrite").parquet(s"$dir/codes_tmp")
    val nNew = spark.read.parquet(s"$dir/codes_tmp").count()
    require(nNew == nOld,
      s"reassignCells row-count drift: $nOld codes -> $nNew; aborting swap")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/codes"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/codes_tmp"),
      new org.apache.hadoop.fs.Path(s"$dir/codes"))
  }
}
