package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.Dedup

/** Scale-path dedup hygiene: the two-phase hash-grouped exact dedup
  * (full text never rides the main shuffle) and the LSH hot-bucket cap
  * (one degenerate (band, bandsig) bucket can't go quadratic).
  */
class DedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("two-phase exactDedup equals direct groupBy(text)") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (10L, "the quick brown fox"),
      (3L, "the quick brown fox"),
      (7L, "lorem ipsum dolor sit"),
      (1L, "entirely unique document"),
      (9L, "lorem ipsum dolor sit"),
      (4L, "lorem ipsum dolor sit")).toDF("doc_id", "text")
    val got = Dedup.exactDedup(docs, "doc_id", "text")
      .orderBy("keeper")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = docs.groupBy("text")
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy("keeper")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got == Seq((1L, 1L), (3L, 2L), (4L, 3L)))
  }

  test("phase-1 hash aggregate prunes the text column from its shuffle") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val plan = Dedup.exactDedup(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // phase 1 must show a map-side partial aggregate keyed on the
    // 8-byte hash ALONE whose node (incl. its output= list, i.e. what
    // the exchange carries) never mentions the text column — the
    // verify branch's regroup keys on (__h, __text) and would not
    // match this predicate
    val phase1 = plan.linesIterator.find(l =>
      l.contains("partial_min") && l.contains("keys=[__h#") &&
        !l.contains("__text"))
    assert(phase1.nonEmpty, plan.take(3000))
  }

  test("similarity/dedup queries leave no cached RDDs in a shared session") {
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("q19_minhash_lsh", "q20_simhash_neardup",
        "q22_embedding_neardup", "q23_ivf_topk", "q47_embedding_clusters")) {
      SparkEntry.queries(q)(spark, sf).count()
    }
    // a long-running session serving many queries must not accumulate
    // cache: the LSH plans are stateless, and the k-means Lloyd loop
    // unpersists its scoped cache before returning
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      spark.sparkContext.getPersistentRDDs.values.map(_.name).toSeq.toString)
  }

  test("LSH hot-bucket cap drops degenerate buckets, keeps distinct near-dups") {
    val s = spark; import s.implicits._
    // 40 byte-identical boilerplate docs: every band is a hot bucket of
    // size 40 (780 candidate pairs); plus one genuinely near-dup pair
    // with its own vocabulary.
    val boiler = (1L to 40L).map(i =>
      (i, "terms of service apply to all content provided herein by the operator"))
    val pairA = (101L, "solar inverter logged fourteen kilowatt hours before the evening peak window")
    val pairB = (102L, "solar inverter logged fourteen kilowatt hours before the evening peak interval")
    val docs = (boiler :+ pairA :+ pairB).toDF("doc_id", "text")

    val capped = Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.5, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((101L, 102L)), s"distinct near-dup pair lost: $capped")
    assert(!capped.exists { case (i, j) => i <= 40L && j <= 40L },
      s"hot bucket leaked pairs through the cap: $capped")

    // with the default cap the same degenerate corpus yields all
    // 40*39/2 boilerplate pairs plus the near-dup pair
    val uncapped = Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.count { case (i, j) => i <= 40L && j <= 40L } == 40 * 39 / 2)
    assert(uncapped.contains((101L, 102L)))
  }
}
