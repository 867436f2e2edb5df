package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical table access over the driver-generated parquet directory
  * (TESTDATA.md). Also derives the engine's canonical `readings`
  * time-series shape (SURVEY.md §1.4) from the `events` table:
  *   readings(meterId, series, ts, values: array<double>, tag).
  *
  * Reference data model: RavenDB document + named time series, see
  * /root/reference/TelemetryToRaven/Meter.cs:5-10 and
  * P1/P1Logger.cs:131-154 (append of (ts, double[], tag)).
  */
object Tables {
  /** events.parquet has shipped with ts as either parquet TIMESTAMP(NANOS)
    * (which Spark's reader rejects outright — read raw nanos as long via
    * the legacy conf and floor-convert with integer division; double
    * arithmetic would lose precision above 2^53 ns) or
    * TIMESTAMP(MICROS, isAdjustedToUTC=false). For the latter, disable
    * NTZ inference so the stored micros land in a plain TIMESTAMP column
    * unshifted (TimestampNTZType would break every `unix_micros` call
    * site, and an NTZ→LTZ cast would re-interpret through the session
    * timezone). Adapt to whichever the footer declares so a regenerated
    * dataset can't break every readings query. DuckDB's `epoch_us` reads
    * the same stored micros, so oracle parity holds either way.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // guard-set: avoid re-mutating session conf on every call (racy when
    // sessions share a conf); builders should set this up front
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong") != Some("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (spark.conf.getOption("spark.sql.parquet.inferTimestampNTZ.enabled") != Some("false"))
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw // TIMESTAMP(MICROS): already read as plain timestamp
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
  def orders(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")
  def customer(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/customer.parquet")
  def supplier(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/supplier.parquet")
  def part(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/part.parquet")
  def nation(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/nation.parquet")
  def region(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/region.parquet")
  def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** events → canonical readings fact table. At 100 TB this table is
    * written partitioned by (series, date) so that per-series range scans
    * prune files (SURVEY.md §4 predicate/partition pruning); here we map
    * on the fly.
    */
  def readings(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      concat(lit("meters/"), col("user_id")).as("meterId"),
      col("event_type").as("series"),
      col("ts"),
      array(col("value")).as("values"),
      col("props").as("tag"))

  /** readings with multi-entry value arrays — the reference appends
    * several named columns per timestamp (KasaLogger.cs:45-47 appends
    * [power, energy+offset, energy]); entry names live in the per-series
    * registry (Meters.defaultRegistry) and are resolved by
    * TsQuery.valueColumnNamed.
    */
  def readingsWide(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      concat(lit("meters/"), col("user_id")).as("meterId"),
      col("event_type").as("series"),
      col("ts"),
      array(col("value"), col("value") / 1000.0, col("value") * 60.0).as("values"),
      col("props").as("tag"))

  /** The meters dimension (see graft.Meters). */
  def meters(spark: SparkSession, dir: String): DataFrame =
    Meters.fromEvents(events(spark, dir))

  /** S19 — register the engine's tables as temp views so the pure-SQL
    * endpoint (`spark.sql(...)` ≙ the reference's HTTP RQL endpoint,
    * Deploy/switchboiler.sh) can query them by name. Together with
    * GraftExtensions' SQL-registered native functions this makes the
    * whole surface drivable from SQL text.
    */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    events(spark, dir).createOrReplaceTempView("events")
    readings(spark, dir).createOrReplaceTempView("readings")
    readingsWide(spark, dir).createOrReplaceTempView("readings_wide")
    meters(spark, dir).createOrReplaceTempView("meters")
    documents(spark, dir).createOrReplaceTempView("documents")
    embeddings(spark, dir).createOrReplaceTempView("embeddings")
  }
}
