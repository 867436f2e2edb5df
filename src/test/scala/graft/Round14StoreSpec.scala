package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{IndexStore, Similarity}

/** Index-store lifecycle specs (round 14, second wave): the persisted
  * index must serve BIT-IDENTICAL results to the in-memory relation
  * path (parquet stores doubles and int64s exactly — this spec is what
  * makes q193's shared-oracle claim a law, not a hope), the filtered
  * serve must be a pure pre-scoring restriction (allow-everything ≡
  * unfiltered, results ⊆ allow-list), and a maintenance refresh
  * persisted through the store must change SERVING exactly as the
  * in-memory maintained centroids would.
  */
class Round14StoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-round14-store-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  private def embeddings: DataFrame = Tables.embeddings(spark, sf)

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-store-$tag").toString

  test("store round-trip serves the in-memory relation path bit-for-bit (two geometries)") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 3)
    for ((nc, ck) <- Seq((6, 6), (4, 8))) {
      val dir = tmpDir(s"rt-$nc-$ck")
      IndexStore.buildIvfPq(e, dir, numCells = nc, cellIters = 2,
        numSub = 4, codebookK = ck, pqIters = 2)
      val served = IndexStore.serveIvfPq(spark, dir, q, k = 4, probes = 2)
      val mem = Similarity.ivfPqTopK(e, q, k = 4, numCells = nc,
        cellIters = 2, probes = 2, numSub = 4, codebookK = ck,
        pqIters = 2, indexAsRelation = true)
      assert(served.columns.toSeq == mem.columns.toSeq)
      assert(rows(served) == rows(mem),
        s"store round-trip diverges from in-memory path at ($nc, $ck)")
    }
  }

  test("filtered serve: allow-everything is the unfiltered result; allow-list bounds the nids") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 3)
    val dir = tmpDir("filt")
    IndexStore.buildIvfPq(e, dir, numCells = 6, cellIters = 2,
      numSub = 4, codebookK = 6, pqIters = 2)
    val plain = IndexStore.serveIvfPq(spark, dir, q, k = 4, probes = 2)
    val all = IndexStore.serveIvfPq(spark, dir, q, k = 4, probes = 2,
      allowed = Some(e.select(col("vec_id"))))
    assert(rows(all) == rows(plain),
      "allow-everything must be a no-op filter")
    val lab = e.filter(col("label") === 3).select(col("vec_id"))
    val labIds = lab.collect().map(_.getLong(0)).toSet
    assert(labIds.nonEmpty, "fixture must have label-3 members")
    val filt = IndexStore.serveIvfPq(spark, dir, q, k = 4, probes = 2,
      allowed = Some(lab))
    val nids = filt.select(col("nid")).collect().map(_.getLong(0))
    assert(nids.nonEmpty, "filtered serve returned nothing")
    assert(nids.forall(labIds.contains),
      "filtered serve leaked a non-allowed member")
    // ranks are dense per query and start at 1 over the RESTRICTED set
    val perQ = filt.groupBy(col("qid"))
      .agg(min(col("rank")).as("lo"), max(col("rank")).as("hi"),
        count(lit(1)).as("n"))
      .collect()
    perQ.foreach { r =>
      assert(r.getAs[Int]("lo") == 1 &&
        r.getAs[Long]("n") == r.getAs[Int]("hi").toLong,
        s"ranks not dense from 1 for qid group: $r")
    }
    // an EMPTY allow-list serves an empty result, not an error
    val none = IndexStore.serveIvfPq(spark, dir, q, k = 4, probes = 2,
      allowed = Some(e.filter(col("label") === -1).select(col("vec_id"))))
    assert(none.count() == 0L)
  }

  test("maintenance refresh persisted via writeCentroids changes serving like the in-memory set") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 3)
    val dir = tmpDir("maint")
    IndexStore.buildIvfPq(e, dir, numCells = 6, cellIters = 2,
      numSub = 4, codebookK = 6, pqIters = 2)
    val (_, maintained) = Similarity.ivfIndexMaintain(e, numCells = 6,
      iters = 2, deltaMod = 10, churnThreshold = 0.1)
    IndexStore.writeCentroids(spark, dir, maintained)
    val served = IndexStore.serveIvfPq(spark, dir, q, k = 4, probes = 2)
    // the reference: the same stored codes/codebooks, probe assignment
    // against the maintained centroids held in memory
    val codes = spark.read.parquet(s"$dir/codes")
    val bookRel = spark.read.parquet(s"$dir/codebooks")
    val centRel = Similarity.centroidRelation(spark, maintained)
    val meta = spark.read.parquet(s"$dir/meta").head()
    val mem = Similarity.ivfPqServe(codes, centRel, bookRel, q, k = 4,
      probes = 2, numSub = meta.getAs[Int]("num_sub"),
      w = meta.getAs[Int]("w"))
    assert(rows(served) == rows(mem),
      "persisted maintained centroids serve differently than in-memory")
  }
}
