package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Plan-shape regression net: the properties that make the flagship
  * queries scale-safe at 100 TB are asserted on the EXECUTED plan, so
  * a refactor that silently de-optimizes (drops a pushed filter, turns
  * a broadcast join into a shuffle, or introduces a cartesian) fails
  * here rather than in production.
  */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q31 readings scan pushes meter/series/range predicates into parquet") {
    val df = SparkEntry.queries("q31_readings_dsl")(spark, sf)
    df.collect() // finalize the AQE plan so codegen spans materialize
    val p = df.queryExecution.executedPlan.toString
    // the filters must reach the scan, not evaluate post-read
    assert(p.contains("PushedFilters: ["), p.take(2000))
    assert(!p.matches("(?s).*PushedFilters: \\[\\].*"), p.take(2000))
    // "*(n)" node prefixes mark whole-stage-codegen'd spans
    assert(p.contains("*("), p.take(2000))
  }

  test("doc ⋈ TS joins broadcast the meters dimension (q36, q44)") {
    val p36 = plan("q36_doc_ts_join")
    assert(p36.contains("BroadcastHashJoin"), p36.take(2000))
    assert(!p36.contains("SortMergeJoin"), p36.take(2000))
    val p44 = plan("q44_mac_discovery")
    assert(p44.contains("BroadcastHashJoin") && p44.contains("LeftSemi"),
      p44.take(3000))
    assert(p44.contains("LeftAnti"), p44.take(3000))
    assert(!p44.contains("SortMergeJoin"), p44.take(3000))
  }

  test("aggregations combine map-side before the exchange (q01)") {
    val p = plan("q01_hourly_avg")
    // partial + final HashAggregate pair around one exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
    assert(p.contains("Exchange"), p.take(2000))
  }

  test("scan-speed text ops introduce no data shuffle (q14/q46/q56)") {
    for (q <- Seq("q14_token_stats", "q46_subword_tokens", "q56_frame_sample")) {
      val p = plan(q)
      // the only exchange is the final presentation sort
      val exchanges = "Exchange".r.findAllIn(p).size
      assert(exchanges <= 1, s"$q has $exchanges exchanges:\n${p.take(2000)}")
    }
  }

  test("driver smoke contract: entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("TF-IDF and OOV broadcast their vocabulary-sized sides (q50/q55)") {
    // the document-frequency table and the corpus-count row are both
    // ≪ corpus: they must come back as broadcasts, never as a
    // sort-merge join that would re-shuffle the exploded token stream
    val p50 = plan("q50_tfidf_topk")
    assert(p50.contains("BroadcastHashJoin"), p50.take(3000))
    assert(!p50.contains("SortMergeJoin"), p50.take(3000))
    val p55 = plan("q55_oov_rate")
    assert(p55.contains("BroadcastHashJoin"), p55.take(3000))
    assert(!p55.contains("SortMergeJoin"), p55.take(3000))
  }

  test("range join is a bucketed equi-join, not a nested-loop scan (q57)") {
    val p = plan("q57_range_join")
    // the bare BETWEEN formulation plans BroadcastNestedLoopJoin —
    // O(events × windows) comparisons; the bucketed strategy must keep
    // it an equi-join with the range refinement inside
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("posting-list join shuffles hashes and ids, never document text (q53)") {
    val p = plan("q53_ngram_jaccard")
    // every exchange's output column list must be hash/id-shaped; the
    // text column feeding shingle_hashes is consumed map-side
    val badExchange = p.linesIterator.find(l =>
      l.contains("Exchange") && l.contains("text"))
    assert(badExchange.isEmpty, s"text rides an exchange: $badExchange")
  }

  test("no unbounded cartesian anywhere in the query surface") {
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val p = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n${p.take(2000)}")
    }
  }
}
