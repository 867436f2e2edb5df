package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Battery (zero-export) simulation — the reference's one genuinely
  * sequential, non-commutative kernel
  * (/root/reference/RandomQueries/ZeroExport.cs:34-73,113-116):
  * an ordered fold over per-minute net grid energy that clamps each
  * step's charge/discharge by power limit, efficiency, and state of
  * charge, and accumulates totals + per-day cycle counts.
  *
  * Not expressible as a window aggregate (each step depends on the
  * clamped state of the previous), so the batch implementation is
  * per-key ordered `mapPartitions`: repartition by meter ⇒ each task
  * folds whole meters; cost is bounded by per-meter cardinality, never
  * total data — the shape that still works at 100 TB with thousands of
  * meters per executor. The streaming twin is flatMapGroupsWithState
  * (see graft.streaming).
  */
object Battery {

  /** Per-step input: net grid energy for one time slot (kWh; positive =
    * import/consumption, negative = export/surplus).
    */
  case class Point(meterId: Long, tsMicros: Long, energyKwh: Double)

  case class Params(
      capacityKwh: Double,
      efficiency: Double, // applied on both paths: charge ×η, discharge ÷η
      maxStepKwh: Double)

  case class Result(
      meterId: Long,
      totalChargedKwh: Double,
      totalDischargedKwh: Double,
      finalSocKwh: Double,
      cycles: Double,
      nDays: Int,
      nSteps: Long)

  /** Accumulated simulation state — also the streaming checkpoint state
    * (graft.streaming.Ingest.batteryStream).
    */
  case class State(
      socKwh: Double, chargedKwh: Double, dischargedKwh: Double,
      steps: Long, lastDay: Long, nDays: Int)

  val initialState: State = State(0.0, 0.0, 0.0, 0L, Long.MinValue, 0)

  /** One recurrence step, matching the reference's algebra exactly
    * (ZeroExport.cs:50-69):
    *   demand  (e > 0): discharge = min(maxE/η, e/η, SoC);      SoC −= discharge
    *   surplus (e ≤ 0): charge    = min(maxE·η, −e·η, cap−SoC); SoC += charge
    */
  def step(st: State, tsMicros: Long, energyKwh: Double, p: Params): State = {
    val day = Math.floorDiv(tsMicros, 86400000000L)
    val (nDays, lastDay) =
      if (day != st.lastDay) (st.nDays + 1, day) else (st.nDays, st.lastDay)
    if (energyKwh > 0) {
      val d = math.min(math.min(p.maxStepKwh / p.efficiency, energyKwh / p.efficiency),
        st.socKwh)
      State(st.socKwh - d, st.chargedKwh, st.dischargedKwh + d, st.steps + 1, lastDay, nDays)
    } else {
      val c = math.min(math.min(p.maxStepKwh * p.efficiency, -energyKwh * p.efficiency),
        p.capacityKwh - st.socKwh)
      State(st.socKwh + c, st.chargedKwh + c, st.dischargedKwh, st.steps + 1, lastDay, nDays)
    }
  }

  /** cycles = (totalCharged + totalDischarged) / 2 / capacity. */
  def result(meterId: Long, st: State, p: Params): Result =
    Result(meterId, st.chargedKwh, st.dischargedKwh, st.socKwh,
      (st.chargedKwh + st.dischargedKwh) / 2.0 / p.capacityKwh, st.nDays, st.steps)

  /** Fold one meter's ordered minute points. */
  def foldMeter(meterId: Long, points: Iterator[Point], p: Params): Result =
    result(meterId,
      points.foldLeft(initialState)((st, pt) => step(st, pt.tsMicros, pt.energyKwh, p)), p)

  /** Distributed batch simulation: one shuffle keyed by meter, ordered
    * fold inside each task. Input df columns: (meterId: long,
    * ts: timestamp, energyKwh: double).
    */
  def simulate(df: DataFrame, p: Params)(implicit spark: SparkSession): Dataset[Result] = {
    import spark.implicits._
    val pts = df.select(
      col("meterId").cast("long").as("meterId"),
      unix_micros(col("ts")).as("tsMicros"),
      col("energyKwh").cast("double").as("energyKwh")).as[Point]
    pts
      .repartition(col("meterId"))
      .sortWithinPartitions(col("meterId"), col("tsMicros"))
      .mapPartitions { it =>
        // partition holds whole meters, sorted by (meter, ts):
        // fold runs per contiguous meter run
        new Iterator[Result] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): Result = {
            // streaming fold over the contiguous meter run — O(1) memory
            // regardless of per-meter cardinality
            val m = buf.head.meterId
            var st = initialState
            while (buf.hasNext && buf.head.meterId == m) {
              val pt = buf.next()
              st = step(st, pt.tsMicros, pt.energyKwh, p)
            }
            result(m, st, p)
          }
        }
      }
  }
}
