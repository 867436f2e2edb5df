package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.functions.ControlLaws
import graft.streaming.App.Connector

/** Sustained-operation soak for the composed streaming pipeline — the
  * gap between "spec'd per-batch" (AppSpec) and "operated": thousands
  * of poll cycles through the REAL decoders into the last-wins
  * readings sink and the stateful run-extender loop, both running
  * under [[App.supervise]], with two kinds of injected failure:
  *
  *   - TRANSIENT EDGE FAILURES: the P1 connector's poll throws on
  *     every 7th tick (the reference's flaky-serial case) — the cycle
  *     is dropped by `decodePollCycles` and the stream keeps running;
  *   - QUERY CRASHES: at three deterministic ticks the decode throws a
  *     first-attempt-only `Error` that sails past the per-cycle
  *     Exception net, kills the micro-batch, and fails the QUERY —
  *     supervision must restart it from the checkpoint, the batch
  *     replays (second attempt passes), and the last-wins sink must
  *     absorb the replay without duplicate rows.
  *
  * The final audit is exact: every non-injected cycle's 5 P1 readings
  * present exactly once (no loss from crashes, no dups from replays),
  * injected cycles absent, extender decisions emitted across
  * restarts (stateful recovery). Prints one JSON summary line; exits
  * nonzero on any audit failure. Usage:
  *   runMain graft.streaming.Soak <cycles> <workDir>
  */
object Soak {

  /** Past decodePollCycles' `catch Exception` on purpose: a poison
    * batch must fail the QUERY, not drop the cycle. Scala's NonFatal
    * treats a plain Error as recoverable, so the task dies cleanly
    * and the query surfaces the failure to the supervisor.
    */
  final class InjectedCrash(tick: Long)
    extends java.lang.Error(s"injected crash at tick $tick")

  // Injection state lives on the OBJECT, not in main's locals: task
  // closures are serialized per task even in local mode, so a captured
  // atomic would deserialize into a fresh copy per task and the
  // "crash only on the first attempt" guard would never stick. Object
  // fields resolve through the singleton (MODULE$) — one JVM, one
  // instance, which is exactly the local-mode soak contract.
  private val injectedPollFailures = new java.util.concurrent.atomic.AtomicLong(0)
  @volatile private var crashTicks: Set[Long] = Set.empty
  private val crashesFired = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()

  private val telegram =
    "/ISK5\\2M550T-1012\r\n\r\n" +
      "1-0:1.7.0(00.421*kW)\r\n1-0:2.7.0(00.000*kW)\r\n" +
      "1-0:32.7.0(230.1*V)\r\n1-0:52.7.0(231.2*V)\r\n1-0:72.7.0(229.9*V)\r\n" +
      "1-0:31.7.0(001*A)\r\n1-0:51.7.0(001*A)\r\n1-0:71.7.0(001*A)\r\n" +
      "1-0:1.8.1(000004.426*kWh)\r\n1-0:1.8.2(000002.399*kWh)\r\n" +
      "1-0:2.8.1(000000.000*kWh)\r\n1-0:2.8.2(000000.000*kWh)\r\n!"

  private val ebusTree =
    """{"broadcast":{"messages":{"outsidetemp":
      |   {"lastup":60,"fields":{"temp2":{"value":11.2}}}}},
      | "hmu":{"messages":{
      |   "FlowTemp":{"lastup":60,"fields":{"0":{"value":25.5}}},
      |   "SetMode":{"lastup":60,"fields":{"flowtempdesired":{"value":25.0}}},
      |   "State":{"lastup":60,"fields":{
      |     "0":{"value":3},"1":{"value":5},"2":{"value":1},"3":{"value":2}}}}},
      | "720":{"messages":{
      |   "z1RoomTemp":{"lastup":60,"fields":{"tempv":{"value":20.6}}},
      |   "z1ActualRoomTempDesired":{"lastup":60,"fields":{"tempv":{"value":21.0}}},
      |   "Hc1MinFlowTempDesired":{"lastup":60,"fields":{"tempv":{"value":24.0}}}}}}
      |""".stripMargin

  def main(args: Array[String]): Unit = {
    val cycles = args.headOption.map(_.toInt).getOrElse(10000)
    val workDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft_soak").toString
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val s: SparkSession = spark
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val readingsDir = s"$workDir/readings"
    val ckpt = s"$workDir/ckpt"
    val t0 = System.nanoTime()

    // --- failure injection config (state lives on the object, above) ---
    crashTicks = Set(cycles / 4L, cycles / 2L, 3L * cycles / 4)
    val restarts = new java.util.concurrent.atomic.AtomicInteger(0)
    val batches = new java.util.concurrent.atomic.AtomicLong(0)
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.numInputRows > 0) batches.incrementAndGet()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    val p1Ticks = MemoryStream[Long]
    val ebusTicks = MemoryStream[Long]
    val connectors = Seq(
      Connector("P1Soak", 10,
        poll = tick => {
          if (tick % 7 == 3) {
            injectedPollFailures.incrementAndGet()
            throw new RuntimeException(s"injected edge failure at tick $tick")
          }
          telegram.getBytes("UTF-8")
        },
        decode = raw => PollSource.dsmrReadingRows(
          "meters/p1", new String(raw, "UTF-8"), 0L),
        ticks = Some(p1Ticks.toDS())),
      Connector("EbusSoak", 30,
        poll = _ => ebusTree.getBytes("UTF-8"),
        decode = raw => PollSource.ebusReadingRows(
          "meters/ebus", new String(raw, "UTF-8")),
        ticks = Some(ebusTicks.toDS())))

    // Readings with exact per-cycle timestamps (minute cadence → the
    // rows land across ~cycles/1440 date partitions) and the crash
    // hook INSIDE the decoded stream so it kills real pipeline
    // batches; decode runs inside the flatMap so tick context
    // survives — same shape as PollSource.decodePollCycles with the
    // tick threaded through to the timestamp.
    def p1Stream(): Dataset[Ingest.Reading] =
      p1Ticks.toDS().flatMap { tick =>
        if (crashTicks.contains(tick) && crashesFired.add(tick))
          throw new InjectedCrash(tick)
        try {
          val raw = connectors(0).poll(tick)
          PollSource.dsmrReadingRows(
            "meters/p1", new String(raw, "UTF-8"), 60000L * (tick + 1))
        } catch { case _: Exception => Seq.empty }
      }
    def ebusStream(): Dataset[Ingest.Reading] =
      ebusTicks.toDS().flatMap { tick =>
        try {
          val raw = connectors(1).poll(tick)
          PollSource.ebusReadingRows("meters/ebus", new String(raw, "UTF-8"))
            .map(r => r.copy(ts = new java.sql.Timestamp(60000L * (tick + 1))))
        } catch { case _: Exception => Seq.empty }
      }

    val extenderCfg = ControlLaws.RunExtenderConfig(
      desiredModulation = 5, minimumFlowTemperature = 24,
      maximumFlowTemperature = 30)
    val decisions = new java.util.concurrent.atomic.AtomicLong(0)

    // --- two supervised queries, one thread each ---
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    def note(m: String): Unit = System.err.println(s"[soak] $m")
    val tReadings = new Thread(() =>
      try App.supervise(
        () => Ingest.lastWinsParquetSink(
            p1Stream().union(ebusStream()).toDF(),
            readingsDir, s"$ckpt/readings").start(),
        maxRestarts = 6, baseMillis = 200L, healthyMillis = 0L,
        onRestart = (n, e) => { restarts.incrementAndGet()
          note(s"readings restart #$n after: ${e.getMessage}") })
      catch { case e: Throwable =>
        note(s"readings supervisor gave up: $e"); failures.add(e); () })
    val tExtender = new Thread(() =>
      try App.supervise(
        () => Ingest.actuatorSink(
            App.runExtenderDecisions(ebusStream(), extenderCfg).toDF()
              .select(col("meterId"), col("newMinimum")),
            s"$ckpt/extender")(ds => { decisions.addAndGet(ds.size.toLong); () })
          .start(),
        maxRestarts = 6, baseMillis = 200L, healthyMillis = 0L,
        onRestart = (n, e) => { restarts.incrementAndGet()
          note(s"extender restart #$n after: ${e.getMessage}") })
      catch { case e: Throwable =>
        note(s"extender supervisor gave up: $e"); failures.add(e); () })
    tReadings.start(); tExtender.start()

    // --- feed: paced chunks so the run is genuinely SUSTAINED — the
    // queries see a steady arrival stream across many micro-batches
    // (~1 min at 10k cycles), not one giant replay batch ---
    val chunk = 50
    val paceMillis = args.lift(2).map(_.toLong).getOrElse(250L)
    var fed = 0L
    while (fed < cycles) {
      val hi = math.min(fed + chunk, cycles.toLong)
      p1Ticks.addData(fed until hi)
      if (fed % 1000 == 0) ebusTicks.addData(fed until math.min(fed + 10, hi))
      fed = hi
      Thread.sleep(paceMillis)
    }
    // --- drain: poll the landed output until the exact expected state
    // is reached (or a generous hard timeout — the audit then reports
    // whatever is missing) ---
    val expectedCycles = (0L until cycles).count(t => t % 7 != 3)
    val deadline = System.nanoTime() + (120L + cycles / 10) * 1000000000L
    var drained = false
    while (!drained && System.nanoTime() < deadline) {
      Thread.sleep(2000)
      val n = try spark.read.parquet(readingsDir)
          .filter(col("meterId") === "meters/p1").count()
        catch { case _: Exception => -1L }
      note(s"drain check: p1 rows $n / ${expectedCycles * 5L}, " +
        s"decisions ${decisions.get()}, restarts ${restarts.get()}")
      drained = n == expectedCycles * 5L && decisions.get() > 0
    }
    spark.streams.active.foreach(_.stop()) // clean stop ends supervision
    tReadings.join(30000); tExtender.join(30000)

    // --- exact audit ---
    val landed = spark.read.parquet(readingsDir)
    val p1Rows = landed.filter(col("meterId") === "meters/p1")
    val rowCount = p1Rows.count()
    val distinctTs = p1Rows.select(countDistinct(col("ts"))).as[Long].head()
    val dupGroups = p1Rows.groupBy(col("series"), col("ts")).count()
      .filter(col("count") > 1).count()
    val secs = (System.nanoTime() - t0) / 1e9
    // restarts can undercount crashes when two poison ticks land in the
    // SAME micro-batch (one query failure covers both) — require all
    // crashes fired and at least one demonstrated restart-recovery
    val ok = rowCount == expectedCycles * 5L && distinctTs == expectedCycles &&
      dupGroups == 0 && crashesFired.size == crashTicks.size &&
      restarts.get() >= 1 && decisions.get() > 0 &&
      failures.isEmpty
    println(s"""{"metric":"soak","cycles":$cycles,"expected_p1_cycles":$expectedCycles,"p1_rows":$rowCount,"expected_rows":${expectedCycles * 5L},"distinct_ts":$distinctTs,"dup_groups":$dupGroups,"injected_poll_failures":${injectedPollFailures.get()},"injected_crashes":${crashesFired.size},"restarts":${restarts.get()},"micro_batches":${batches.get()},"extender_decisions":${decisions.get()},"supervisor_giveups":${failures.size},"secs":${math.round(secs * 10) / 10.0},"pass":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
