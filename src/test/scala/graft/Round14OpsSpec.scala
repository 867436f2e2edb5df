package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Similarity

/** Round-14 specs: the index-as-relation search path must be
  * output-IDENTICAL to the plan-literal path (the q94↔q105
  * swap-equality discipline) — same cosine arithmetic, same zero-norm
  * pins, same tie orders — at more than one index geometry, so the
  * literal→relation swap is a pure plan-shape decision a deployment
  * makes on index size, never a semantics change.
  */
class Round14OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-round14-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  private def embeddings: DataFrame = Tables.embeddings(spark, sf)

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("kmeansCentroidSeq viaRelation trains identical centroids (two geometries)") {
    val e = embeddings
    for ((nc, it) <- Seq((7, 2), (5, 3))) {
      val lit0 = Similarity.kmeansCentroidSeq(e, nc, it)
      val rel = Similarity.kmeansCentroidSeq(e, nc, it, viaRelation = true)
      assert(lit0 == rel, s"Lloyd literal≠relation at ($nc, $it)")
    }
  }

  test("assignCellsRelation equals assignCells (probes 1 and 3)") {
    val e = embeddings
    val v = e.select(col("vec_id"),
      Similarity.asDouble(col("embedding")).as("v"))
    val cent = Similarity.kmeansCentroidSeq(e, numCells = 7, iters = 2)
    val centRel = Similarity.centroidRelation(spark, cent)
    for (probes <- Seq(1, 3)) {
      val lit0 = Similarity.assignCells(v, cent, probes)
        .orderBy(col("vec_id"), col("probe"))
      val rel = Similarity.assignCellsRelation(v, centRel, probes)
        .orderBy(col("vec_id"), col("probe"))
      assert(lit0.columns.toSeq == rel.columns.toSeq,
        s"probes=$probes schema: ${rel.columns.toSeq}")
      assert(rows(lit0) == rows(rel),
        s"probes=$probes: literal and relation assignment diverge")
    }
  }

  test("assignCellsRelation with an empty index yields empty (documented divergence)") {
    val e = embeddings
    val v = e.select(col("vec_id"),
      Similarity.asDouble(col("embedding")).as("v"))
    val empty = Similarity.centroidRelation(spark, Nil)
    assert(Similarity.assignCellsRelation(v, empty, 1).count() == 0L)
    intercept[IllegalArgumentException] {
      Similarity.assignCells(v, Nil, 1)
    }
  }

  test("ivfPqTopK: indexAsRelation output identical at two configs") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 3)
    val configs = Seq(
      // the q121 geometry and a deliberately different one (odd cell
      // count, wider PQ, deeper probes) so the equality isn't an
      // artifact of one shape
      (8, 2, 2, 4, 8, 2, 5),
      (5, 1, 3, 8, 4, 1, 4))
    for ((nc, ci, pr, ns, ck, pi, k) <- configs) {
      val lit0 = Similarity.ivfPqTopK(e, q, k, nc, ci, pr, ns, ck, pi)
      val rel = Similarity.ivfPqTopK(e, q, k, nc, ci, pr, ns, ck, pi,
        indexAsRelation = true)
      assert(lit0.columns.toSeq == rel.columns.toSeq)
      assert(rows(lit0) == rows(rel),
        s"ivfPqTopK literal≠relation at ($nc,$ci,$pr,$ns,$ck,$pi,$k)")
    }
  }

  test("ivfPqResidualTopK: indexAsRelation output identical at two configs") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 3)
    val configs = Seq(
      (8, 2, 2, 4, 8, 2, 5),
      (5, 1, 3, 8, 4, 1, 4))
    for ((nc, ci, pr, ns, ck, pi, k) <- configs) {
      val lit0 = Similarity.ivfPqResidualTopK(e, q, k, nc, ci, pr, ns, ck, pi)
      val rel = Similarity.ivfPqResidualTopK(e, q, k, nc, ci, pr, ns, ck, pi,
        indexAsRelation = true)
      assert(lit0.columns.toSeq == rel.columns.toSeq)
      assert(rows(lit0) == rows(rel),
        s"ivfPqResidualTopK literal≠relation at ($nc,$ci,$pr,$ns,$ck,$pi,$k)")
    }
  }

  test("ivfIndexMaintain: decision thresholds, rebuild = full retrain, persistence round-trip") {
    val e = embeddings
    // τ=1.0 can never trip: the cheap refresh path is taken
    val (ro1, refreshed) = Similarity.ivfIndexMaintain(e, numCells = 8,
      iters = 2, deltaMod = 10, churnThreshold = 1.0)
    val r1 = ro1.collect()(0)
    assert(r1.getAs[String]("decision") == "refresh")
    assert(r1.getAs[Long]("n_batch") > 0 &&
      r1.getAs[Long]("n_batch") < r1.getAs[Long]("n_total"))
    // τ=0.0 trips on any movement: full retrain, and the maintained
    // set must equal the from-scratch Lloyd on the merged corpus
    val (ro0, rebuilt) = Similarity.ivfIndexMaintain(e, numCells = 8,
      iters = 2, deltaMod = 10, churnThreshold = 0.0)
    val r0 = ro0.collect()(0)
    assert(r0.getAs[Long]("n_moved") > 0,
      "fixture must exhibit drift for the rebuild branch to mean anything")
    assert(r0.getAs[String]("decision") == "rebuild")
    assert(rebuilt == Similarity.kmeansCentroidSeq(e, 8, 2))
    // refresh ≠ rebuild on this fixture (the decision matters)
    assert(refreshed != rebuilt)
    // persistence round-trip: the maintained set written as a relation
    // and reloaded serves assignments identical to the in-memory set
    val dir = java.nio.file.Files.createTempDirectory("graft_idx").toString
    Similarity.centroidRelation(spark, refreshed)
      .write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    val v = e.select(col("vec_id"),
      Similarity.asDouble(col("embedding")).as("v"))
    val viaDisk = Similarity.assignCellsRelation(v, reloaded, 1)
      .orderBy(col("vec_id")).collect().toSeq.map(_.toSeq)
    val viaMem = Similarity.assignCells(v, refreshed, 1)
      .orderBy(col("vec_id")).collect().toSeq.map(_.toSeq)
    assert(viaDisk == viaMem, "persisted index diverges from trained index")
  }

  test("relation search plan carries no index-sized literals") {
    // The point of the swap: the literal plan embeds the index as
    // expressions (k·d doubles in typedLit maps/arrays); the relation
    // plan must not. Proxy check: the analyzed plan's string dump of
    // the relation path contains no Lloyd centroid double (6-dp
    // rounded mean) as an expression literal, and is dramatically
    // smaller than the literal plan's.
    val e = embeddings
    val q = e.filter(col("vec_id") < 3)
    val lit0 = Similarity.ivfPqResidualTopK(e, q, 5, 8, 2, 2, 4, 8, 2)
    val rel = Similarity.ivfPqResidualTopK(e, q, 5, 8, 2, 2, 4, 8, 2,
      indexAsRelation = true)
    val litPlan = lit0.queryExecution.analyzed.toString
    val relPlan = rel.queryExecution.analyzed.toString
    assert(relPlan.length * 5 < litPlan.length,
      s"relation plan (${relPlan.length} chars) is not materially " +
        s"smaller than the literal plan (${litPlan.length} chars)")
    assert(!relPlan.contains("keys:"),
      "relation plan still carries a literal map (typedLit CreateMap)")
  }
}
