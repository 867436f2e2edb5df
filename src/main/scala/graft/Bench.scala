package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints the headline JSON line (totals leading, the
  * long per-query dict last) plus a compact `"metric":"summary"` line
  * BOTH before and after it:
  *   {"metric":"summary","total":N,"shared34":S,...}
  *   {"metric":"total","value":N,"shared34":S,...,"queries":{...},"status":{...}}
  *   {"metric":"summary","total":N,"shared34":S,...}
  * so the headline numbers survive HEAD- or TAIL-truncated log capture
  * (the r12/r13 artifacts each lost one end; a "metric":"total" parser
  * ignores the summary lines either way).
  *
  * Methodology (recorded in BASELINE.md): each query is executed
  * SPARK_GRAFT_REPEAT times (default 3) in-session and the reported
  * time is the MEDIAN — the round-2 verdict showed single-shot timings
  * on this shared host swing 2-7x run-to-run on unchanged plans, so a
  * per-query median is the only comparable statistic. r1/r2 artifacts
  * were single-shot; the per-round table in BASELINE.md notes this.
  *
  * WATCHDOG (round-15 item 5): every execution runs under a per-query
  * wall-clock budget (SPARK_GRAFT_BUDGET_SEC, default 120 s — 10× the
  * slowest healthy r14 query). On breach the query's Spark job group
  * is CANCELLED, the query records value -1 with status "timeout",
  * its remaining repeats are skipped, and the session moves on — one
  * pathological configuration can no longer poison the queries behind
  * it (the q183 grind silently taxed three neighbors before this).
  * Breached/erroring queries are excluded from the headline totals and
  * surfaced in the "status" dict (non-ok only) + n_failed/n_timeout.
  *
  * RETRY-ONCE (round-17 item 1): a breach on this shared host is more
  * often a NOISY WINDOW than a bad plan (elevated readings co-move
  * across unrelated plans within a wall-clock window and revert on an
  * identical rerun — the r16 q81 artifact read timeout while seven
  * controlled same-day measurements read 1.8–3.3 s). So a timed-out
  * query is REQUEUED ONCE at the end of the full pass, in a fresh job
  * group against a freshly-quiesced session, with the full repeat
  * count: a first-pass breach records a number whenever the retry
  * window is healthy, and only a DOUBLE breach — two budget overruns
  * in two separate windows, which no amount of host noise explains —
  * records status "timeout". Retried-and-recovered queries report
  * their retry-pass median, count toward the totals, and are surfaced
  * in the "status" dict as "retried" (+ n_retried) so the artifact
  * says which numbers came from a second window. Errors are NOT
  * retried: a thrown plan is deterministic, not weather.
  *
  * Env knobs:
  *   SPARK_GRAFT_SF_DIR      data directory (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS        local[N] cores = shuffle partitions (default 4)
  *   SPARK_GRAFT_REPEAT      executions per query, median reported (default 3)
  *   SPARK_GRAFT_BUDGET_SEC  per-execution wall budget (default 120)
  *   SPARK_GRAFT_ONLY        comma-separated query-name filter (debugging)
  */
object Bench {

  /** Execute `action` under a wall-clock budget, isolated in its own
    * Spark job group: on breach the group is cancelled (running stages
    * abort; `interruptOnCancel` interrupts task threads) and the
    * breach is reported WITHOUT throwing into the caller's loop.
    * Right(seconds) on success, Left(reason) on breach or error.
    */
  private[graft] def runWithBudget(spark: SparkSession, tag: String,
      budgetMs: Long)(action: => Unit): Either[String, Double] = {
    @volatile var err: Option[Throwable] = None
    val t0 = System.nanoTime()
    val th = new Thread(() => {
      try {
        spark.sparkContext.setJobGroup(tag, tag, interruptOnCancel = true)
        action
      } catch { case e: Throwable => err = Some(e) }
      finally spark.sparkContext.clearJobGroup()
    }, s"bench-$tag")
    th.setDaemon(true)
    th.start()
    th.join(budgetMs)
    if (th.isAlive) {
      spark.sparkContext.cancelJobGroup(tag)
      // give the cancellation a moment to unwind task threads so the
      // next query starts against a quiet scheduler
      th.join(30000L)
      Left(s"timeout after ${budgetMs / 1000.0}s")
    } else err match {
      case Some(e) => Left(s"error ${e.getClass.getName}: ${e.getMessage}")
      case None => Right((System.nanoTime() - t0) / 1e9)
    }
  }

  /** The retry-once law over a finished first pass: every "timeout"
    * row gets exactly one `remeasure` at the END of the run (a fresh
    * window, fresh job group); an "ok" remeasure replaces the -1 with
    * the retry median under status "retried" (so the artifact says
    * which numbers came from a second window), any other remeasure
    * outcome stands as recorded. "ok"/"error" first-pass rows pass
    * through untouched — errors are deterministic plans, not weather,
    * and retrying them would just double a broken query's damage.
    */
  private[graft] def retryPass(
      firstPass: Seq[(String, Double, String)],
      remeasure: String => (Double, String)): Seq[(String, Double, String)] =
    firstPass.map {
      case (name, _, "timeout") =>
        System.err.println(s"[bench] retrying $name after first-pass timeout")
        val (median, status) = remeasure(name)
        status match {
          case "ok" => (name, median, "retried")
          case other => (name, median, other)
        }
      case ok => ok
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt
    val budgetMs =
      (sys.env.getOrElse("SPARK_GRAFT_BUDGET_SEC", "120").toDouble * 1000).toLong
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the session (codegen compiler, parquet reader, shuffle
    // machinery) so the first measured query isn't charged for it
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    // deterministic (sorted) execution order so per-query timings are
    // comparable across rounds
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // One full measurement of one query: hygiene, then repeat-many
    // budgeted executions, median of the successes. `tag` names the
    // Spark job group (the retry pass uses a distinct tag so the two
    // windows are distinguishable in any event-log postmortem).
    def measure(name: String, tag: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame):
        (Double, String) = {
      // Session hygiene between queries: a 104-query x 3-repeat session
      // accumulates old-gen debris (cached relations, broadcast blocks,
      // codegen classes) that the round-9 artifact showed taxing tail
      // queries 5-23x on unchanged plans. Clear cached state and give
      // the collector an explicit chance BEFORE the timer starts, so
      // each query is measured against a quiet heap rather than 100
      // predecessors' garbage.
      spark.catalog.clearCache()
      System.gc()
      // only successful executions count toward the median; a query
      // that throws must surface as -1, not as a near-zero time that
      // LOWERS the total (a broken query would read as a speedup). A
      // TIMEOUT additionally stops the remaining repeats — re-running
      // a breached config would multiply the damage the budget bounds.
      var timedOut = false
      val times = (1 to repeat).iterator.takeWhile(_ => !timedOut).flatMap {
        _ =>
          runWithBudget(spark, tag, budgetMs) {
            fn(spark, sfDir).count(); ()
          } match {
            case Right(t) => Some(t)
            case Left(reason) =>
              // diagnosis to stderr so the stdout JSON stays parseable
              System.err.println(s"[bench] $name failed: $reason")
              if (reason.startsWith("timeout")) timedOut = true
              None
          }
      }.toSeq.sorted
      // true median (mean of middle two when the repeat count is even)
      val median =
        if (timedOut || times.isEmpty) -1.0
        else if (times.size % 2 == 1) times(times.size / 2)
        else (times(times.size / 2 - 1) + times(times.size / 2)) / 2.0
      val status =
        if (timedOut) "timeout" else if (times.isEmpty) "error" else "ok"
      (median, status)
    }
    val firstPass = names.map { case (name, fn) =>
      val (median, status) = measure(name, name, fn)
      (name, median, status)
    }
    val results = retryPass(firstPass, name =>
      measure(name, s"$name-retry", SparkEntry.queries(name)))
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // non-ok statuses only (the dict stays tiny on a healthy run)
    val st = results.collect { case (k, _, s) if s != "ok" =>
      s"\"" + k + "\":\"" + s + "\""
    }.mkString("{", ",", "}")
    // failed queries (-1 markers) are excluded from the headline total
    val total = results.map(_._2).filter(_ >= 0).sum
    // shared-34 subset: the round-1 query surface (q01..q34) — the
    // cross-round comparable statistic BASELINE.md tracks
    val shared34 = results
      .filter { case (k, v, _) =>
        v >= 0 && k.take(3).drop(1).forall(_.isDigit) &&
          k.slice(1, 3).toInt <= 34 && k(3) == '_'
      }.map(_._2).sum
    val nFailed = results.count(_._2 < 0)
    val nTimeout = results.count(_._3 == "timeout")
    val nRetried = results.count(_._3 == "retried")
    // totals lead the main line AND repeat on compact summary lines at
    // BOTH ends ("metric":"summary", so a "metric":"total" parser
    // ignores them) — the round-12 artifact's tail capture truncated
    // the 170-key line and lost the headline numbers; the machine-
    // readable totals now survive head- or tail-truncation
    val summary = s"""{"metric":"summary","total":$total,"shared34":$shared34,"n_queries":${results.size},"n_failed":$nFailed,"n_timeout":$nTimeout,"n_retried":$nRetried,"unit":"sec","sf":"$sfDir"}"""
    println(summary)
    println(s"""{"metric":"total","value":$total,"shared34":$shared34,"n_queries":${results.size},"n_failed":$nFailed,"n_timeout":$nTimeout,"n_retried":$nRetried,"unit":"sec","sf":"$sfDir","queries":$qs,"status":$st}""")
    println(summary)
    spark.stop()
  }
}
