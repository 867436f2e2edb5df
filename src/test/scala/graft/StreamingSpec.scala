package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.streaming.Ingest
import graft.streaming.Ingest.Reading

/** Streaming twins vs their batch kernels: windowed averages with
  * watermark and the per-meter trapezoid interpolation state.
  */
case class DocEvent(doc_id: Long, text: String, ts: java.sql.Timestamp)
case class SourcedDoc(doc_id: Long, text: String, source: String)
case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
case class MaintWindow(user_id: Long, win_id: Long,
    start_ts: java.sql.Timestamp, end_ts: java.sql.Timestamp)

class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-streaming-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def reading(meter: String, sec: Long, v: Double): Reading =
    Reading(meter, "Power", new java.sql.Timestamp(sec * 1000L), Seq(v), "W")

  test("streaming dedup admits first occurrence only, keyed by content hash") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[DocEvent]
    val q = Ingest.dedupStream(mem.toDF(), lateness = "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      def doc(id: Long, text: String, sec: Long) =
        DocEvent(id, text, new java.sql.Timestamp(sec * 1000L))
      // batch 1: two distinct texts, one in-batch duplicate
      mem.addData(doc(1, "alpha beta", 0), doc(2, "gamma delta", 1),
        doc(3, "alpha beta", 2))
      q.processAllAvailable()
      // batch 2: cross-batch duplicate within the horizon + one new doc
      mem.addData(doc(4, "alpha beta", 30), doc(5, "epsilon zeta", 31))
      q.processAllAvailable()
      val kept = spark.table("dedup_stream")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // one representative per content (which in-batch twin survives is
      // partition-order arbitrary), and the cross-batch duplicate (doc
      // 4) is dropped by the hash-keyed state
      assert(kept.size == 3 && (kept & Set(1L, 3L)).size == 1 &&
        kept.contains(2L) && kept.contains(5L) && !kept.contains(4L),
        s"kept $kept")
      // the state key is the 8-byte content hash, not raw text: the
      // output carries it for downstream audit
      val cols = spark.table("dedup_stream").columns.toSet
      assert(cols.contains("content_hash"))
    } finally q.stop()
  }

  test("incrementalDedupStream flags index dups as they arrive, matching batch") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val index = Seq((1L, shared), (2L, shared + " kappa"),
      (3L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val mem = MemoryStream[DocEvent]
    val q = Ingest.incrementalDedupStream(mem.toDF(), index,
      lateness = "10 minutes")
      .writeStream.format("memory").queryName("incdedup_stream")
      .outputMode("append").start()
    try {
      def doc(id: Long, text: String, sec: Long) =
        DocEvent(id, text, new java.sql.Timestamp(sec * 1000L))
      // ts must sit ABOVE the initial zero watermark: the dedup
      // operator drops event times ≤ watermark as late, and a brand-new
      // query starts at watermark 1970-01-01 — epoch-0 fixtures vanish
      mem.addData(doc(100, shared, 3600),
        doc(101, "fresh unseen material nothing like the index at all", 3601))
      q.processAllAvailable()
      mem.addData(doc(102, shared + " iota", 3630))
      q.processAllAvailable()
      val got = spark.table("incdedup_stream")
        .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // multi-band matches collapse to one row per (i, j); the fresh
      // doc emits nothing; batch and stream agree on the pair set
      val batch = graft.operators.Dedup.incrementalDedup(
        Seq((100L, shared),
          (101L, "fresh unseen material nothing like the index at all"),
          (102L, shared + " iota")).toDF("doc_id", "text"),
        index, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == batch && got.contains((100L, 1L)) && got.contains((102L, 1L))
        && !got.exists(_._1 == 101L), s"got $got batch $batch")
    } finally q.stop()
  }

  test("gopher stream gates documents at ingest, matching the batch body row-for-row") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[DocEvent]
    val q = Ingest.gopherStream(mem.toDF())
      .writeStream.format("memory").queryName("gopher")
      .outputMode("append").start()
    try {
      def doc(id: Long, text: String) =
        DocEvent(id, text, new java.sql.Timestamp(id * 1000L))
      val input = Seq(
        doc(1, "the of is " + (1 to 27).map(i => f"wrd$i%02d").mkString(" ")), // keep
        doc(2, "the of tiny"),                                                 // too short
        doc(3, (1 to 30).map(i => f"wrd$i%02d").mkString(" ")))                // no stopwords
      mem.addData(input: _*)
      q.processAllAvailable()
      val rows = spark.table("gopher")
        .select("doc_id", "keep")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(rows == Map(1L -> true, 2L -> false, 3L -> false))
      val batch = graft.operators.TextOps
        .gopherRules(input.toDF(), "doc_id", "text")
        .select("doc_id", "keep")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(rows == batch)
    } finally q.stop()
  }

  test("contamination stream counts shared bench shingles, matching batch exactly") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val benchText = "the quick brown fox jumps over the lazy dog tonight"
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val mem = MemoryStream[DocEvent]
    val q = Ingest.contaminationStream(mem.toDF(), bench)
      .writeStream.format("memory").queryName("contam")
      .outputMode("complete").start()
    try {
      def doc(id: Long, text: String) =
        DocEvent(id, text, new java.sql.Timestamp(id * 1000L))
      val input = Seq(
        doc(1, benchText + " and some tail"),                // many shared 3-grams
        doc(2, "entirely original content with no benchmark overlap at all"),
        doc(3, "the quick brown fox went elsewhere entirely today"))  // shares 2
      mem.addData(input: _*)
      q.processAllAvailable()
      val rows = spark.table("contam")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // batch operator on the union frame with the bench predicate must
      // agree exactly (the twin contract)
      val batch = graft.operators.Dedup.contamination(
          (input.map(d => (d.doc_id, d.text)) :+ ((100L, benchText)))
            .toDF("doc_id", "text"),
          "doc_id", "text", benchPredicate = col("doc_id") === 100L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rows == batch, s"stream $rows vs batch $batch")
      assert(rows.contains(1L) && rows.contains(3L) && !rows.contains(2L))
    } finally q.stop()
  }

  test("curation stream scores and filters documents statelessly, matching batch") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[DocEvent]
    val q = Ingest.curationStream(mem.toDF(), minTokens = 3)
      .writeStream.format("memory").queryName("curation")
      .outputMode("append").start()
    try {
      def doc(id: Long, text: String) =
        DocEvent(id, text, new java.sql.Timestamp(id * 1000L))
      mem.addData(
        doc(1, "the quick brown fox jumps"), // keeps: 5 tokens, en markers
        doc(2, "hi"),                        // drops: under min tokens
        doc(3, "spam spam spam spam spam spam spam spam spam spam spam")) // drops: 10/11 dup
      q.processAllAvailable()
      val rows = spark.table("curation")
        .select("doc_id", "pred_lang", "keep")
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
      assert(rows(1L) == (("en", true)))
      assert(rows(2L)._2 == false)
      assert(rows(3L)._2 == false) // dup_word_frac 10/11 > 0.9
      // batch twin must agree row-for-row on the same inputs
      val batch = Ingest.curationStream(Seq(
          doc(1, "the quick brown fox jumps"), doc(2, "hi"),
          doc(3, "spam spam spam spam spam spam spam spam spam spam spam")).toDF(),
          minTokens = 3)
        .select("doc_id", "pred_lang", "keep")
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
      assert(rows == batch)
    } finally q.stop()
  }

  test("cms sketch stream: fixed-size cells accumulate across batches, estimates never undercount") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[DocEvent]
    val depth = 3; val width = 1024
    val q = Ingest.cmsSketchStream(mem.toDF(), depth = depth, width = width)
      .writeStream.format("memory").queryName("cms")
      .outputMode("complete").start()
    try {
      def doc(id: Long, text: String) =
        DocEvent(id, text, new java.sql.Timestamp(id * 1000L))
      val batch1 = Seq(doc(1, "foo bar foo bar foo bar"), doc(2, "one two three"))
      val batch2 = Seq(doc(3, "foo bar baz qux"), doc(4, "one two one two"))
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val streamCells = spark.table("cms")
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      // state stays inside the fixed grid
      assert(streamCells.size <= depth * width)
      assert(streamCells.keys.forall { case (r, b) => r < depth && b < width })
      // the running sketch equals the batch sketch over the union
      val batchCells = graft.operators.TextOps.cmsCellsOf(
          graft.operators.TextOps.cmsBucketed(
            (batch1 ++ batch2).toDF(), "text", depth, width), depth)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamCells == batchCells)
      // CMS law: min-over-rows estimate >= true count for every gram
      val trueCounts = (batch1 ++ batch2).toDF()
        .select(explode(graft.operators.TextOps.tokenNgramsOfTokens(
          graft.operators.TextOps.tokens(col("text")), 2)).as("gram"))
        .groupBy("gram").count()
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val bucketsOf = (g: String) => (0 until depth).map { r =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
        r -> java.lang.Long.parseLong(hex.substring(5 * r, 5 * r + 5), 16) % width
      }
      trueCounts.foreach { case (g, c) =>
        val est = bucketsOf(g).map { case (r, b) => streamCells.getOrElse((r, b), 0L) }.min
        assert(est >= c, s"CMS undercounts '$g': est $est < true $c")
      }
    } finally q.stop()
  }

  test("hll sketch stream: bounded registers accumulate across batches, equal the batch sketch") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[DocEvent]
    val withSrc = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("source",
        when(col("doc_id") % 2 === 0, "even").otherwise("odd"))
    val q = Ingest.hllSketchStream(withSrc(mem.toDF()))
      .writeStream.format("memory").queryName("hll")
      .outputMode("complete").start()
    try {
      def doc(id: Long, text: String) =
        DocEvent(id, text, new java.sql.Timestamp(id * 1000L))
      val batch1 = Seq(doc(1, "foo bar foo baz"), doc(2, "one two three"))
      val batch2 = Seq(doc(3, "foo qux quux corge"), doc(4, "one two four"))
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val streamRegs = spark.table("hll")
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
      // state stays inside the fixed register grid: <= 256 per group
      assert(streamRegs.keys.forall { case (_, b) => b >= 0 && b < 256 })
      assert(streamRegs.groupBy(_._1._1).forall(_._2.size <= 256))
      // the running registers equal the batch registers over the union
      val batchRegs = graft.operators.TextOps.hllRegisters(
          graft.operators.TextOps.hllBucketed(
            withSrc((batch1 ++ batch2).toDF()), "text", "source"))
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
      assert(streamRegs == batchRegs)
    } finally q.stop()
  }

  test("winnow stream: stateless append fingerprints equal the batch selection") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[DocEvent]
    val q = Ingest.winnowStream(mem.toDF())
      .writeStream.format("memory").queryName("winnow")
      .outputMode("append").start()
    try {
      def doc(id: Long, text: String) =
        DocEvent(id, text, new java.sql.Timestamp(id * 1000L))
      val batch1 = Seq(doc(1, "a b c d e f g h i j"), doc(2, "x y"))
      val batch2 = Seq(doc(3, "p q r s t u v w"))
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("winnow")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      val batch = graft.operators.Dedup.winnowedFingerprints(
          (batch1 ++ batch2).toDF(), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      assert(streamed == batch && streamed.nonEmpty)
      // doc 2 is shorter than w+k-1: no fingerprint rows
      assert(!streamed.exists(_._1 == 2L))
    } finally q.stop()
  }

  test("chunk-dedup gate: stream-static window probe counts dup windows per doc") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val corpus = Seq((100L, "a b c d e f g h")).toDF("doc_id", "text")
    val index = Ingest.chunkHashIndex(corpus, maxLen = 4, stride = 4)
    val mem = MemoryStream[DocEvent]
    val q = Ingest.chunkDedupStream(mem.toDF(), index,
        maxLen = 4, stride = 4)
      .writeStream.format("memory").queryName("chunkgate")
      .outputMode("update").start()
    try {
      def doc(id: Long, text: String) =
        DocEvent(id, text, new java.sql.Timestamp(id * 1000L))
      // doc 1: both windows verbatim from the corpus; doc 2: fresh
      mem.addData(doc(1, "a b c d e f g h"), doc(2, "p q r s t u v w"))
      q.processAllAvailable()
      val rows = spark.table("chunkgate")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(rows(1L) == ((2L, 2L)), s"got ${rows(1L)}")
      assert(rows(2L) == ((2L, 0L)), s"got ${rows(2L)}")
    } finally q.stop()
  }

  test("split stream: stateless verdicts equal the batch assignment across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[DocEvent]
    val withSrc = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("source", lit("crawl"))
    val q = Ingest.splitStream(withSrc(mem.toDF()))
      .writeStream.format("memory").queryName("splits")
      .outputMode("append").start()
    try {
      def doc(id: Long) = DocEvent(id, s"text $id",
        new java.sql.Timestamp(id * 1000L))
      mem.addData((1L to 50L).map(doc): _*)
      q.processAllAvailable()
      mem.addData((51L to 100L).map(doc): _*)
      q.processAllAvailable()
      val streamed = spark.table("splits")
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      val batch = graft.operators.Curation.splitAssignment(
          withSrc((1L to 100L).map(doc).toDF()), "doc_id", "source")
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(streamed == batch)
      assert(streamed.values.toSet.subsetOf(Set("train", "valid", "test")))
    } finally q.stop()
  }

  test("chunk stream emits window plans statelessly, matching batch (q72 twin)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[DocEvent]
    val q = Ingest.chunkStream(mem.toDF(), maxLen = 4, stride = 3)
      .writeStream.format("memory").queryName("chunks")
      .outputMode("append").start()
    try {
      def doc(id: Long, text: String) =
        DocEvent(id, text, new java.sql.Timestamp(id * 1000L))
      val input = Seq(doc(1, "a b c d e f g"), doc(2, "x y")) // 7 and 2 tokens
      mem.addData(input: _*)
      q.processAllAvailable()
      val rows = spark.table("chunks")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
      // doc 1: starts 1,4,7 → lengths 4,4,1; doc 2: one short window
      assert(rows == Set((1L, 0, 1, 4), (1L, 1, 4, 4), (1L, 2, 7, 1), (2L, 0, 1, 2)))
      // batch twin must agree row-for-row on the same inputs
      val batch = Ingest.chunkStream(input.toDF(), maxLen = 4, stride = 3)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
      assert(rows == batch)
    } finally q.stop()
  }

  test("windowed averages finalize per watermark (A1 streaming twin)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Reading]
    val q = Ingest.windowedAverages(mem.toDF(), "1 minute", "30 seconds")
      .writeStream.format("memory").queryName("win_avg")
      .outputMode("append").start()
    try {
      mem.addData(reading("m1", 0, 10), reading("m1", 30, 20), reading("m1", 59, 30))
      q.processAllAvailable()
      // advance watermark far past the first window
      mem.addData(reading("m1", 300, 1))
      q.processAllAvailable()
      mem.addData(reading("m1", 600, 1))
      q.processAllAvailable()
      val rows = spark.table("win_avg")
        .select(unix_millis(col("bucket")).as("b"), col("avg_value"), col("n"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      assert(rows.contains((0L, 20.0, 3L))) // first minute finalized
    } finally q.stop()
  }

  test("streaming sessionization finalizes gap-based sessions (q59 twin)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[UserEvent]
    val q = Ingest.sessionizeStream(mem.toDF(), gap = "30 minutes",
        lateness = "1 minute")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      def ev(u: Long, sec: Long) =
        UserEvent(u, new java.sql.Timestamp(sec * 1000L), 1.0)
      // user 1: two events 10 min apart (one session), then a 40-min
      // gap (new session); user 2: one lone event. Split across
      // micro-batches so the session store must merge fragments.
      mem.addData(ev(1, 0), ev(2, 60))
      q.processAllAvailable()
      mem.addData(ev(1, 600), ev(1, 3000))
      q.processAllAvailable()
      // push the watermark far past everything to finalize all sessions
      mem.addData(ev(9, 100000))
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .select(col("user_id"), unix_millis(col("session_start")).as("st"),
          col("n_events"), col("duration_us"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(rows.contains((1L, 0L, 2L, 600000000L)),
        s"merged first session missing: $rows")  // 0s + 600s merged
      assert(rows.contains((1L, 3000000L, 1L, 0L)), s"gap session missing: $rows")
      assert(rows.contains((2L, 60000L, 1L, 0L)), s"lone session missing: $rows")
    } finally q.stop()
  }

  test("stream-stream interval join matches events into windows (q57 twin)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val evMem = MemoryStream[UserEvent]
    val winMem = MemoryStream[MaintWindow]
    val q = Ingest.intervalJoinStream(evMem.toDF(), winMem.toDF(),
        lateness = "1 minute", maxWindowLen = "2 hours")
      .writeStream.format("memory").queryName("interval_join")
      .outputMode("append").start()
    try {
      // timestamps offset well past epoch: the initial watermark IS
      // the epoch, and a watermarked range join drops input rows whose
      // event time is <= the current watermark — a window starting at
      // second 0 would be "late" into an empty stream (found the hard
      // way; equality-only joins don't apply that filter)
      def ts(sec: Long) = new java.sql.Timestamp((100000L + sec) * 1000L)
      // one window per user; events land inside, outside, and on the
      // boundary. Both streams carry data in the FIRST batch — until a
      // stream has produced data its watermark doesn't participate in
      // the global min, so a window side idle in batch 1 would see the
      // event side's advanced watermark and have its (earlier) rows
      // dropped as late on arrival: the documented idle-source caveat
      // of multi-stream event time, not an operator property.
      evMem.addData(UserEvent(1, ts(100), 10.0), UserEvent(1, ts(5000), 20.0),
        UserEvent(2, ts(100), 30.0))
      winMem.addData(MaintWindow(1, 0, ts(0), ts(3600)),
        MaintWindow(2, 0, ts(200), ts(3600)))
      q.processAllAvailable()
      // cross-batch: the boundary event arrives a batch later and must
      // still match the buffered window state (inclusive end)
      evMem.addData(UserEvent(1, ts(3600), 40.0))
      q.processAllAvailable()
      val rows = spark.table("interval_join")
        .select(col("user_id"), col("win_id"), col("value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // (1, ts 100) in window; (1, ts 5000) outside end; (2, ts 100)
      // before window start; (1, ts 3600) on the inclusive boundary
      assert(rows == Set((1L, 0L, 10.0), (1L, 0L, 40.0)), s"got $rows")
    } finally q.stop()
  }

  test("streaming trapezoid interpolation matches the batch kernel (W3)") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Reading]
    val q = Ingest.interpolateEnergy(mem.toDS(), "Power")
      .writeStream.format("memory").queryName("interp")
      .outputMode("append").start()
    try {
      // two micro-batches: state must carry across them
      mem.addData(reading("m1", 0, 0.0), reading("m1", 1800, 50.0))
      q.processAllAvailable()
      mem.addData(reading("m1", 3600, 100.0))
      q.processAllAvailable()
      val cum = spark.table("interp")
        .orderBy(col("tsMicros")).select(col("cumEnergy"))
        .collect().map(_.getDouble(0)).toSeq
      // trapezoid of a 0→100 ramp over 1 h sampled at 0/1800/3600 = 50 power-hours
      assert(cum.last == 50.0)
      // equals the batch kernel on the same points
      val batch = graft.operators.TimeSeriesOps.trapezoidIntegrate(
        Seq((0L, 0.0), (1800L, 50.0), (3600L, 100.0))
          .toDF("sec", "v")
          .select(timestamp_seconds(col("sec")).as("ts"), lit("m1").as("k"), col("v")),
        Seq("k"), "ts", "v")
        .agg(sum("step_energy")).collect()(0).getDouble(0)
      assert(batch == cum.last)
    } finally q.stop()
  }

  test("file source streams dropped reading files (poll-cycle ingest)") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_filesrc")
    val q = Ingest.fileSource(spark, dir.toString)
      .writeStream.format("memory").queryName("file_readings")
      .outputMode("append").start()
    try {
      java.nio.file.Files.writeString(dir.resolve("poll1.json"),
        """{"meterId":"m1","series":"Power","ts":"2024-01-01T00:00:00.000Z","values":[240.0],"tag":"W"}
          |{"meterId":"m1","series":"CO2","ts":"2024-01-01T00:00:01.000Z","values":[600.0,21.5],"tag":"ppm;C"}
          |""".stripMargin)
      q.processAllAvailable()
      java.nio.file.Files.writeString(dir.resolve("poll2.json"),
        """{"meterId":"m2","series":"Power","ts":"2024-01-01T00:01:00.000Z","values":[100.0],"tag":"W"}
          |""".stripMargin)
      q.processAllAvailable()
      val rows = spark.table("file_readings").collect()
      assert(rows.length == 3)
      val co2 = rows.find(_.getAs[String]("series") == "CO2").get
      assert(co2.getSeq[Double](co2.fieldIndex("values")) == Seq(600.0, 21.5))
    } finally q.stop()
  }

  test("streaming battery state matches the batch fold across micro-batches (W1)") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    import s.implicits._
    import graft.operators.Battery
    val p = Battery.Params(10, 0.5, 100)
    val pts = Seq(
      Battery.Point(1, 0L, -2.0),
      Battery.Point(1, 60000000L, 1.0),
      Battery.Point(1, 120000000L, -30.0))
    val mem = MemoryStream[Battery.Point]
    val q = graft.streaming.Ingest.batteryStream(mem.toDS(), p)
      .writeStream.format("memory").queryName("battery_stream")
      .outputMode("append").start()
    try {
      mem.addData(pts(0), pts(1)) // batch 1
      q.processAllAvailable()
      mem.addData(pts(2)) // batch 2 — state must carry over
      q.processAllAvailable()
      val last = spark.table("battery_stream")
        .orderBy(col("tsMicros").desc).limit(1).collect()(0)
      val batch = Battery.foldMeter(1, pts.iterator, p)
      assert(last.getAs[Double]("socKwh") == batch.finalSocKwh)
      assert(last.getAs[Double]("chargedKwh") == batch.totalChargedKwh)
      assert(last.getAs[Double]("dischargedKwh") == batch.totalDischargedKwh)
      assert(last.getAs[Double]("cycles") == batch.cycles)
    } finally q.stop()
  }

  test("last-wins parquet sink dedups same-timestamp re-appends (S7)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val mem = MemoryStream[Reading]
    val q = Ingest.lastWinsParquetSink(mem.toDF(), dir, ckpt).start()
    try {
      mem.addData(reading("m1", 0, 1.0), reading("m1", 0, 2.0), reading("m1", 60, 3.0))
      q.processAllAvailable()
      val rows = spark.read.parquet(dir)
      assert(rows.count() == 2) // same-ts duplicate collapsed
      assert(rows.columns.contains("date")) // partition layout present
      // a re-poll of ts 0 landing in a LATER micro-batch must compact
      // to one stored row with the new value (P1Logger's re-append
      // overwrite held in storage, not just in-batch / at query time)
      mem.addData(reading("m1", 0, 9.0))
      q.processAllAvailable()
      val after = spark.read.parquet(dir)
      assert(after.count() == 2) // still exactly one row per (key, ts)
      val v0 = after.filter(col("ts") === new java.sql.Timestamp(0L))
        .collect().map(_.getAs[scala.collection.Seq[Double]]("values").head)
      assert(v0.toSeq == Seq(9.0)) // the later batch's write won
      // an untouched day + a re-poll in one batch: only touched
      // partitions rewrite, the day-2 row must survive the compaction
      mem.addData(reading("m1", 86400, 4.0), reading("m1", 60, 5.0))
      q.processAllAvailable()
      val day2 = spark.read.parquet(dir)
      assert(day2.count() == 3)
      val v60 = day2.filter(col("ts") === new java.sql.Timestamp(60000L))
        .collect().map(_.getAs[scala.collection.Seq[Double]]("values").head)
      assert(v60.toSeq == Seq(5.0))
    } finally q.stop()
  }
  test("blocklist stream gates documents at ingest, matching the batch body row-for-row") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SourcedDoc]
    val q = Ingest.blocklistStream(mem.toDF(), blocklist = Seq("bad", "worse"),
        maxHits = 1)
      .writeStream.format("memory").queryName("blockgate")
      .outputMode("append").start()
    try {
      val input = Seq(
        SourcedDoc(1L, "good clean text", "src0"),
        SourcedDoc(2L, "bad text bad again", "src0"),
        SourcedDoc(3L, "worse text", "src1"))
      mem.addData(input: _*)
      q.processAllAvailable()
      val rows = spark.table("blockgate").select("doc_id", "n_hits", "keep")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(rows == Set((1L, 0L, true), (2L, 2L, false), (3L, 1L, true)))
      val batch = graft.operators.TextOps
        .blocklistFilter(input.toDF(), "doc_id", "text", Seq("bad", "worse"), 1)
        .select("doc_id", "n_hits", "keep")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(rows == batch)
    } finally q.stop()
  }

  test("sample stream rebalances the mixture at ingest, deterministically across replays") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SourcedDoc]
    val rates = Map("src0" -> (1, 4), "src1" -> (3, 4))
    val q = Ingest.sampleStream(mem.toDF(), rates)
      .writeStream.format("memory").queryName("samplegate")
      .outputMode("append").start()
    try {
      val input = (1L to 200L).map(i =>
        SourcedDoc(i, s"doc $i", if (i % 2 == 0) "src0" else "src1"))
      mem.addData(input: _*)
      q.processAllAvailable()
      val got = spark.table("samplegate").select("doc_id", "kept")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      // identical verdicts to the batch operator (the stream IS the body)
      val batch = graft.operators.Curation
        .seededSourceSample(input.toDF(), "doc_id", "source", rates)
        .select("doc_id", "kept")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(got == batch)
      // a replayed micro-batch reaches the same verdicts (exactly-once
      // composition): feed the same rows again, verdicts must not flip
      mem.addData(input.take(50): _*)
      q.processAllAvailable()
      val replay = spark.table("samplegate").select("doc_id", "kept")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1))
      replay.foreach { case (id, k) => assert(got(id) == k, s"doc $id flipped") }
      // the mixture actually moved: src1 keeps ~3x the fraction of src0
      val keptBySrc = input.groupBy(_.source).map { case (src, docs2) =>
        src -> docs2.count(d => got(d.doc_id)).toDouble / docs2.size
      }
      assert(keptBySrc("src1") > keptBySrc("src0"))
    } finally q.stop()
  }
}
