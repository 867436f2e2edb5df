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

  /** Fold one meter's ordered minute points, matching the reference's
    * algebra exactly (ZeroExport.cs:50-69):
    *   demand  (e > 0): discharge = min(maxE/η, e/η, SoC);      SoC −= discharge
    *   surplus (e ≤ 0): charge    = min(maxE·η, −e·η, cap−SoC); SoC += charge
    *   cycles = (totalCharged + totalDischarged) / 2 / capacity
    */
  def foldMeter(meterId: Long, points: Iterator[Point], p: Params): Result = {
    var soc = 0.0
    var charged = 0.0
    var discharged = 0.0
    var steps = 0L
    var lastDay = Long.MinValue
    var nDays = 0
    while (points.hasNext) {
      val pt = points.next()
      val day = Math.floorDiv(pt.tsMicros, 86400000000L)
      if (day != lastDay) { nDays += 1; lastDay = day }
      val e = pt.energyKwh
      if (e > 0) { // demand → discharge
        val d = math.min(math.min(p.maxStepKwh / p.efficiency, e / p.efficiency), soc)
        soc -= d
        discharged += d
      } else { // surplus (or zero) → charge
        val c = math.min(math.min(p.maxStepKwh * p.efficiency, -e * p.efficiency),
          p.capacityKwh - soc)
        soc += c
        charged += c
      }
      steps += 1
    }
    Result(meterId, charged, discharged, soc,
      (charged + discharged) / 2.0 / p.capacityKwh, nDays, steps)
  }

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
            val m = buf.head.meterId
            val run = new scala.collection.mutable.ArrayBuffer[Point]()
            while (buf.hasNext && buf.head.meterId == m) run += buf.next()
            foldMeter(m, run.iterator, p)
          }
        }
      }
  }
}
