package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.TimeSeriesOps

/** Thin fluent query DSL over the canonical `readings` table
  * (meterId, series, ts, values: array<double>, tag) — the engine's
  * public query surface, equivalent to the reference's
  * `session.TimeSeriesFor(doc, name)` + RQL shapes (SURVEY.md §3 E1/E2).
  *
  * Every combinator only composes Column expressions onto a DataFrame,
  * so the result is a plain Catalyst plan: filter pushdown, column
  * pruning, and partial aggregation all apply untouched. Nothing here
  * executes until the caller acts on [[df]].
  *
  * {{{
  * TsQuery(readings)
  *   .meter("meters/42").series("Power")
  *   .between(from, to)
  *   .buckets(1.hour).avg()            // -> (meterId, series, bucket, avg_value, n)
  * }}}
  *
  * Fill policies for alignment reproduce the reference's three
  * absent-data behaviors (SURVEY.md §7.4): missing⇒default (J1),
  * missing⇒NaN (EbusRunExtender), inner (abort-on-missing).
  */
final case class TsQuery(df: DataFrame) {

  private def value(i: Int): Column = element_at(col("values"), i + 1)

  def meter(id: String): TsQuery = copy(df.filter(col("meterId") === id))

  def series(names: String*): TsQuery =
    copy(df.filter(col("series").isInCollection(names)))

  /** Range scan [from, to) on event time — S1/S2. */
  def between(fromTs: Column, toTs: Column): TsQuery =
    copy(df.filter(col("ts") >= fromTs && col("ts") < toTs))

  /** Trailing window: ts >= cutoff — the reference's "last N minutes". */
  def since(cutoff: Column): TsQuery = copy(df.filter(col("ts") >= cutoff))

  /** Select one value column (positional, like registered TS columns). */
  def valueColumn(i: Int): TsQuery =
    copy(df.withColumn("value", value(i)))

  /** Select a value column BY NAME through the per-series registry
    * (≙ the reference's registered TS column names,
    * P1/P1Logger.cs:103-127): each series maps the name to its own
    * position; series without that column yield null. Resolved at plan
    * time into a when-chain — no join, stays in codegen.
    */
  def valueColumnNamed(
      name: String,
      registry: Map[String, Seq[String]] = graft.Meters.defaultRegistry): TsQuery = {
    val cases = registry.toSeq.sortBy(_._1).flatMap { case (s, cols) =>
      val i = cols.indexOf(name)
      if (i >= 0) Some((col("series") === s, value(i))) else None
    }
    require(cases.nonEmpty, s"value column '$name' is not registered for any series")
    val resolved = cases.foldRight(lit(null).cast("double")) {
      case ((cond, v), acc) => when(cond, v).otherwise(acc)
    }
    copy(df.withColumn("value", resolved))
  }

  private def valueOrFirst: Column =
    if (df.columns.contains("value")) col("value") else value(0)

  /** Tumbling-bucket aggregation (A1/A2): avg/min/max/count per
    * (meterId, series, bucket).
    */
  def bucketedAvg(intervalMillis: Long): DataFrame =
    df.groupBy(col("meterId"), col("series"),
      TimeSeriesOps.bucket(col("ts"), intervalMillis).as("bucket"))
      .agg(avg(valueOrFirst).as("avg_value"), count(lit(1)).as("n"))

  /** Last entry per (meterId, series) — A3. */
  def last(): DataFrame =
    TimeSeriesOps.lastByKey(df, Seq(col("meterId"), col("series")), col("ts"),
      Seq("last_values" -> col("values"), "last_tag" -> col("tag")))

  /** Exact percentile of the first value column per series — A6. */
  def percentile(p: Double): DataFrame =
    df.groupBy(col("meterId"), col("series"))
      .agg(org.apache.spark.sql.functions.percentile(valueOrFirst, lit(p)).as("pct"))

  /** Align several series on a common bucket grid (J1), one column per
    * series; fill = Some(default) for missing⇒default, None for
    * missing⇒null (caller decides NaN/abort).
    */
  def alignAvg(
      intervalMillis: Long,
      seriesNames: Seq[String],
      fill: Option[Double] = Some(0.0)): DataFrame = {
    val pivoted = df
      .filter(col("series").isInCollection(seriesNames))
      .groupBy(TimeSeriesOps.bucket(col("ts"), intervalMillis).as("bucket"))
      .pivot(col("series"), seriesNames)
      .agg(avg(valueOrFirst))
    fill match {
      case Some(d) =>
        seriesNames.foldLeft(pivoted)((acc, s) =>
          acc.withColumn(s, coalesce(col(s), lit(d))))
      case None => pivoted
    }
  }

  /** Rate of change of the first value column per (meterId, series) — W5. */
  def rate(): DataFrame =
    TimeSeriesOps.rateFromCounter(
      df.withColumn("value", valueOrFirst), Seq("meterId", "series"), "ts", "value")

  /** Running trapezoid integral of the first value column — W3. */
  def integrate(): DataFrame =
    TimeSeriesOps.trapezoidIntegrate(
      df.withColumn("value", valueOrFirst), Seq("meterId", "series"), "ts", "value")
}
