package graft.streaming

/** Poll-harness laws (SURVEY.md §2.6 W9–W11) — the reference's logger
  * loop scheduling, re-expressed as pure state transitions so the
  * micro-batch driver (Trigger.ProcessingTime + foreachBatch) can apply
  * them: the next-delay law decides the trigger interval, the cadence
  * law filters which configured items a batch actually polls, and
  * retry-once wraps each flaky device call.
  */
object Harness {

  /** W9 — adaptive delay with failure backoff (LoggerService.cs:27-48):
    * a successful cycle schedules base − elapsed (floor 5 s) so cycles
    * stay on the base grid regardless of work time; a failed cycle
    * DOUBLES the current delay until it reaches an hour (one final
    * doubling may overshoot the cap, exactly like the reference's
    * `if (Delay < 1h) Delay += Delay`).
    */
  def nextDelayMillis(
      baseMillis: Long,
      currentMillis: Long,
      workMillis: Long,
      failed: Boolean): Long =
    if (!failed) math.max(baseMillis - workMillis, 5000L)
    else if (currentMillis < 3600000L) currentMillis * 2
    else currentMillis

  /** The per-cycle work timeout: twice the base interval
    * (LoggerService.cs:34).
    */
  def workTimeoutMillis(baseMillis: Long): Long = 2 * baseMillis

  /** W10 — per-item cadence (EbusLogger.cs:89-101): each configured
    * item carries its own read interval; the device cache honors
    * maxage = 80% of that interval, so an item is due when its last
    * read is at least 0.8·interval old. `dueItems` is the batch-side
    * filter; items never read before are always due.
    */
  def maxAgeSeconds(readIntervalSeconds: Double): Int =
    math.round(readIntervalSeconds * 0.8).toInt

  def isDue(intervalMillis: Long, lastReadMillis: Option[Long], nowMillis: Long): Boolean =
    lastReadMillis.forall(last => nowMillis - last >= (intervalMillis * 8L) / 10L)

  def dueItems(
      items: Seq[(String, Long)], // (name, readIntervalMillis)
      lastRead: Map[String, Long],
      nowMillis: Long): Seq[String] =
    items.collect {
      case (name, interval) if isDue(interval, lastRead.get(name), nowMillis) => name
    }

  /** W11 — retry-once (LoggerService.cs:62-73): one immediate retry
    * after a failure; the second failure propagates. `onRetry` is the
    * warn-log hook.
    */
  def retryOnce[T](onRetry: Throwable => Unit = _ => ())(f: => T): T =
    try f
    catch {
      case e: Throwable =>
        onRetry(e)
        f
    }
}
