package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The meters dimension: doc derivation, last-wins upsert (S6), the
  * Kasa rolling-offset law, and named value-column resolution through
  * the series registry.
  */
class MetersSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def eventsDf = {
    import spark.implicits._
    Seq(
      (0L, "view", 1000L, 10.0),
      (0L, "view", 2000L, 12.0),
      (3L, "view", 1000L, 100.0),
      (3L, "view", 2000L, 3.0), // counter reset: 3 < 100 - 0.01
      (5L, "view", 1000L, 7.0))
      .toDF("user_id", "event_type", "ts_ms", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
  }

  test("fromEvents derives one typed doc per device, deterministically") {
    val m = Meters.fromEvents(eventsDf).orderBy("userId").collect()
    assert(m.map(_.getAs[String]("meterId")).toSeq ==
      Seq("meters/0", "meters/3", "meters/5"))
    val doc0 = m(0)
    assert(doc0.getAs[String]("vendorInfo") == "DSMR5") // 0 % 5 -> idx 1
    assert(doc0.getAs[String]("medium") == "Electricity")
    assert(doc0.getAs[Double]("energyOffset") == 0.0)
    assert(doc0.getAs[Boolean]("extendRuns")) // 0 % 3 == 0
    val doc3 = m(1)
    assert(doc3.getAs[String]("vendorInfo") == "SDM630") // 3 % 5 -> idx 4
    assert(doc3.getAs[Double]("energyOffset") == 30.0)
    // registers carry the per-doc offset in the Energy register
    val regs = doc3.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("registers")
    assert(regs.map(r => (r.getAs[Int]("register"), r.getAs[String]("seriesName"))) ==
      Seq((12, "Power"), (72, "Energy")))
    assert(regs(1).getAs[Double]("offset") == 30.0)
  }

  test("upsert is last-wins per meterId and passes unmatched docs through (S6)") {
    val current = Meters.fromEvents(eventsDf)
    // poll cycle mutated meters/3: new offset + failed poll
    val updated = current.filter(col("userId") === 3)
      .withColumn("energyOffset", lit(130.0))
      .withColumn("lastPollSuccessful", lit(false))
    val merged = Meters.upsert(current, updated)
    assert(merged.count() == 3)
    val m3 = merged.filter(col("userId") === 3).collect()(0)
    assert(m3.getAs[Double]("energyOffset") == 130.0)
    assert(!m3.getAs[Boolean]("lastPollSuccessful"))
    // untouched doc unchanged
    val m0 = merged.filter(col("userId") === 0).collect()(0)
    assert(m0.getAs[Double]("energyOffset") == 0.0)
    // within one batch of updates, highest _seq wins
    val v1 = updated.withColumn("energyOffset", lit(1.0)).withColumn("_seq", lit(1L))
    val v2 = updated.withColumn("energyOffset", lit(2.0)).withColumn("_seq", lit(2L))
    val merged2 = Meters.upsert(current, v1.unionByName(v2))
    assert(merged2.filter(col("userId") === 3).collect()(0)
      .getAs[Double]("energyOffset") == 2.0)
  }

  test("energyOffsetUpdate folds the last stored reading on counter reset") {
    val out = Meters.energyOffsetUpdate(
      Meters.fromEvents(eventsDf),
      eventsDf.select(col("user_id"), col("ts"), col("value")))
      .orderBy("user_id").collect()
    // user 0: 12 > 10, offset stays 0.0
    assert(out(0).getAs[Double]("new_offset") == 0.0)
    // user 3: 3 < 100 - eps -> new offset = round(prev + oldOffset, 4) = 130.0
    assert(out(1).getAs[Double]("new_offset") == 130.0)
    // user 5: single reading, prev null -> offset unchanged (50.0 = 5 % 7 * 10)
    assert(out(2).getAs[Double]("new_offset") == 50.0)
  }

  test("valueColumnNamed resolves per-series positions from the registry") {
    import spark.implicits._
    val readings = Seq(
      ("meters/1", "click", 1000L, Seq(5000.0, 5.0, 300000.0)),
      ("meters/1", "purchase", 1000L, Seq(9.0, 0.009, 540.0)))
      .toDF("meterId", "series", "ts_ms", "values")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withColumn("tag", lit(""))
    val kw = TsQuery(readings).valueColumnNamed("Power [kW]").df
      .select(col("series"), col("value")).collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    // click registers "Power [kW]" at position 2; purchase doesn't have it
    assert(kw("click").contains(5.0))
    assert(kw("purchase").isEmpty)
    // "Value" resolves to position 1 for purchase only
    val v = TsQuery(readings).valueColumnNamed("Value").df
      .select(col("series"), col("value")).collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(v("purchase").contains(9.0))
    assert(v("click").isEmpty)
    // unregistered name is rejected at plan time
    intercept[IllegalArgumentException] {
      TsQuery(readings).valueColumnNamed("No Such Column")
    }
  }

  test("metersUpsertSink merges micro-batch doc updates into the snapshot") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("meters").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val srcDir = java.nio.file.Files.createTempDirectory("updates").toString
    Meters.fromEvents(eventsDf).write.mode("overwrite").parquet(dir)
    // a poll cycle writes one updated doc as a JSON-lines file
    val schema = spark.read.parquet(dir).schema
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(srcDir, "batch1.json"),
      """{"meterId":"meters/3","userId":3,"vendorInfo":"SDM630","medium":"Electricity","energyOffset":130.0,"lastPollSuccessful":false,"extendRuns":true,"switchThermostat":false,"desiredModulation":5.0,"minimumFlowTemperature":24.0,"maximumFlowTemperature":30.0,"registers":[],"switchTimePeriods":[]}""")
    val stream = spark.readStream.schema(schema).json(srcDir)
    val q = graft.streaming.Ingest.metersUpsertSink(stream, dir, ckpt).start()
    q.processAllAvailable(); q.stop()
    val after = spark.read.parquet(dir)
    assert(after.count() == 3)
    assert(after.filter(col("userId") === 3).collect()(0)
      .getAs[Double]("energyOffset") == 130.0)
    assert(after.filter(col("userId") === 0).collect()(0)
      .getAs[Double]("energyOffset") == 0.0)
  }
}
