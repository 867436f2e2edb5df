package graft

import graft.operators.{Dedup, Exec, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Round-18 OPTIMIZATION equivalence specs: every rewrite in this round
  * claims bit-identical output — these tests pin each claim against the
  * shape it replaced.
  *
  *  - Exec.rebind: re-rooting a frame at its RDD changes the logical
  *    plan, never a row or the schema.
  *  - Exec.materializeToTemp: the read-back relation carries the same
  *    rows and leaves no persisted RDDs behind.
  *  - pqCodebooks (batched across subspaces): identical centroids to
  *    the per-subspace kmeansCentroidSeq recurrence it replaced.
  *  - encodeLiteral (one-scan PQ encode): identical (vec_id, sub, code)
  *    rows to the union-of-assignCells-branches shape it replaced.
  */
class Round18OptSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  test("Exec.rebind preserves rows and schema exactly") {
    val df = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), col("label"))
      .persist()
    try {
      val re = Exec.rebind(df)
      assert(re.schema == df.schema)
      val a = df.collect().map(_.toString).sorted.toSeq
      val b = re.collect().map(_.toString).sorted.toSeq
      assert(a == b, "rebind changed row content")
    } finally { df.unpersist(); () }
  }

  test("Exec.materializeToTemp: same rows, no persisted RDDs left") {
    val df = Tables.documents(spark, sf)
      .select(col("doc_id"), xxhash64(col("text")).as("h"))
    val mat = Exec.materializeToTemp(df, "spec")
    assert(mat.collect().map(_.toString).sorted.toSeq ==
      df.collect().map(_.toString).sorted.toSeq)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("batched pqCodebooks equals the per-subspace Lloyd recurrence it replaced") {
    val e = Tables.embeddings(spark, sf)
    val (w, books) = Similarity.pqCodebooks(e, numSub = 4, codebookK = 8,
      iters = 2)
    // reference: the pre-round-18 shape — one independent
    // kmeansCentroidSeq per subspace over the sliced vectors
    val v = e.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val ref = (0 until 4).map { sub =>
      sub -> Similarity.kmeansCentroidSeq(v.select(col("vec_id"),
        slice(col("v"), lit(sub * w + 1), lit(w)).as("embedding")),
        8, 2)
    }
    assert(books.map(_._1) == ref.map(_._1))
    for (((s1, got), (_, want)) <- books.zip(ref)) {
      assert(got == want, s"subspace $s1 centroids diverge:\n$got\nvs\n$want")
    }
  }

  test("encodeLiteral equals the union-of-assignCells encode it replaced") {
    val e = Tables.embeddings(spark, sf)
    val (w, books) = Similarity.pqCodebooks(e, numSub = 4, codebookK = 8,
      iters = 1)
    val v = e.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val got = Similarity.encodeLiteral(v, w, books)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sorted.toSeq
    val want = books.map { case (sub, cent) =>
      Similarity.assignCells(v.select(col("vec_id"),
        slice(col("v"), lit(sub * w + 1), lit(w)).as("v")), cent, probes = 1)
        .select(col("vec_id"), lit(sub).as("sub"), col("cell").as("code"))
    }.reduce(_ unionAll _)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sorted.toSeq
    assert(got == want)
  }

  test("assignCellsRelationArr equals assignCellsRelation on both probes branches") {
    val e = Tables.embeddings(spark, sf)
    val v = e.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val cent = Similarity.kmeansCentroidSeq(e, numCells = 8, iters = 1)
    val rel = Similarity.centroidRelation(spark, cent)
    for (probes <- Seq(1, 3)) {
      val a = Similarity.assignCellsRelation(v, rel, probes)
        .collect().map(_.toString).sorted.toSeq
      val b = Similarity.assignCellsRelationArr(v, rel, probes)
        .collect().map(_.toString).sorted.toSeq
      assert(a == b, s"probes=$probes diverges")
    }
    // empty relation: both shapes yield an empty result
    val empty = rel.filter(col("cid") < 0)
    assert(Similarity.assignCellsRelationArr(v, empty, 1).count() == 0L)
    assert(Similarity.assignCellsRelation(v, empty, 1).count() == 0L)
  }

  test("connectedComponents returned frame survives the loop caches being dropped") {
    val s = spark; import s.implicits._
    // the returned plan must be self-contained (temp-parquet-backed):
    // count it twice, clear every cache between, equal both times
    val edges = ((1L to 6L).map(i => (i, i + 1)) ++ Seq((10L, 11L)))
      .toDF("i", "j")
    val cc = Dedup.connectedComponents(edges)
    val first = cc.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    spark.sharedState.cacheManager.clearCache()
    val second = cc.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(first == second && first.nonEmpty)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
