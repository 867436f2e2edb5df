package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}

/** The device-connector shape shared by every reference logger
  * (S9 HTTP JSON, S10 subprocess XML, S13 TCP Kasa, S14 subprocess
  * Tapo, S16 HID CO₂): a poll cycle fires on a cadence, an edge
  * function fetches one raw payload from the device, a pure decoder
  * turns it into reading rows, and the rows flow into the normal
  * streaming pipeline (windowed aggs, last-wins sink, meters upsert).
  *
  * Spark-native re-expression: the cadence is a streaming tick source
  * (`rate` in production, MemoryStream in specs), the edge fetch runs
  * ON THE EXECUTOR inside flatMap (each tick is a task — a fleet of
  * devices shards across executors by tick key), and the decoder is
  * one of the pure functions in graft.functions. The sandbox has no
  * devices, so the edge function is injected — specs wire
  * deterministic fakes through the REAL decoders (DSMR telegrams,
  * Vents frames, Kasa ciphertext), which is everything Spark-side.
  */
object PollSource {

  /** Production tick source: one row per `intervalSeconds`. */
  def rateTicks(spark: SparkSession, intervalSeconds: Int): Dataset[Long] = {
    import spark.implicits._
    spark.readStream.format("rate")
      .option("rowsPerSecond", 1)
      .load()
      .selectExpr("value")
      .as[Long]
      .filter(_ % intervalSeconds.max(1) == 0)
  }

  /** One poll cycle per tick: fetch a raw payload at the edge, decode
    * to reading rows. Decode failures drop the cycle (the reference
    * logs and retries next cycle); pair with Harness.retryOnce inside
    * `poll` for the reference's one-retry semantics.
    */
  def decodePollCycles(
      ticks: Dataset[Long],
      poll: Long => Array[Byte],
      decode: Array[Byte] => Seq[Ingest.Reading]): Dataset[Ingest.Reading] = {
    import ticks.sparkSession.implicits._
    ticks.flatMap { tick =>
      try decode(poll(tick))
      catch { case _: Exception => Seq.empty }
    }
  }

  /** S8/S9 — DSMR P1 pipeline: raw serial/HTTP chunk → telegram frames
    * → the five reading rows per telegram, stamped with the tick's
    * timestamp by the caller-provided mapper.
    */
  def dsmrReadingRows(
      meterId: String, raw: String, tsMillis: Long): Seq[Ingest.Reading] =
    graft.functions.Parsers.dsmrFrames(raw).flatMap { telegram =>
      graft.functions.Parsers.dsmrReadings(telegram).map {
        case (series, (values, tag)) =>
          Ingest.Reading(meterId, series, new java.sql.Timestamp(tsMillis),
            values.toSeq, tag)
      }
    }

  /** S12 — Vents pipeline: framed UDP reply → TLV items → the four
    * reading rows the logger appends.
    */
  def ventsReadingRows(
      meterId: String, frame: Array[Byte], tsMillis: Long): Seq[Ingest.Reading] =
    graft.functions.Vents.parseReply(frame) match {
      case Right(items) =>
        graft.functions.Vents.pollReadings(items).map { case (series, values, tag) =>
          Ingest.Reading(meterId, series, new java.sql.Timestamp(tsMillis), values, tag)
        }
      case Left(_) => Seq.empty
    }

  /** S11 — Goodwe pipeline: CRC-checked 153-byte UDP frame → the seven
    * series rows the logger appends (GoodweLogger.cs:74-81), stamped
    * with the inverter's own clock bytes resolved through the site zone
    * (P11, GoodwePoller.cs:84-86). The reference tags GridFrequency
    * "V" — mirrored verbatim.
    */
  def goodweReadingRows(
      meterId: String, frame: Array[Byte],
      zone: java.time.ZoneId): Seq[Ingest.Reading] =
    graft.functions.BinaryDecoders.goodweDecode(frame) match {
      case Right(t) =>
        val ts = new java.sql.Timestamp(
          graft.functions.BinaryDecoders.goodweTimestampMicros(t, zone) / 1000L)
        Seq(
          Ingest.Reading(meterId, "Power", ts, Seq(t.powerW), "W"),
          Ingest.Reading(meterId, "MPPT1", ts, Seq(t.ipv, t.vpv), "A,V"),
          Ingest.Reading(meterId, "Vac", ts, Seq(t.vac), "V"),
          Ingest.Reading(meterId, "GridFrequency", ts, Seq(t.gridFrequency), "V"),
          Ingest.Reading(meterId, "InternalTemperature", ts, Seq(t.temperatureC), "°C"),
          Ingest.Reading(meterId, "EnergyLifetime", ts, Seq(t.energyLifetimeKwh), "kWh"),
          Ingest.Reading(meterId, "EnergyToday", ts, Seq(t.energyTodayKwh), "kWh"))
      case Left(_) => Seq.empty
    }

  /** S10 — M-Bus pipeline: subprocess XML → the six series rows
    * (MbusLogger.cs:82-95 + derived CalculatedPower).
    */
  def mbusReadingRows(
      meterId: String, xml: String, tsMillis: Long): Seq[Ingest.Reading] =
    graft.functions.MbusXml.readings(xml).map { r =>
      Ingest.Reading(meterId, r.series, new java.sql.Timestamp(tsMillis),
        r.values.toSeq, r.tag)
    }

  /** S16 — ZyAura CO₂ pipeline: 8-byte encrypted HID report →
    * decrypt → opcode dispatch → one CO2/RoomTemperature row (or none
    * for unsupported opcodes, ZGm053Service.cs:129-165).
    */
  def zyauraReadingRows(
      meterId: String, report: Array[Byte], tsMillis: Long): Seq[Ingest.Reading] = {
    import graft.functions.BinaryDecoders._
    if (report.length != 8) Seq.empty
    else zyauraParse(zyauraDecrypt(report)) match {
      case Co2Ppm(v) =>
        Seq(Ingest.Reading(meterId, "CO2",
          new java.sql.Timestamp(tsMillis), Seq(v), "ppm"))
      case RoomTemperatureC(v) =>
        Seq(Ingest.Reading(meterId, "RoomTemperature",
          new java.sql.Timestamp(tsMillis), Seq(v), "°C"))
      case Unsupported => Seq.empty
    }
  }

  /** S17 — GPIO pulse pipeline (GpioLogger.cs:75-100): each debounced
    * edge appends a step pair — a pre-point 10 ms before the edge
    * holding the previous count, then the incremented count — so the
    * counter series renders as a staircase; the first-ever pulse is a
    * single row with rate 0.
    */
  def gpioPulseRows(
      meterId: String, seriesName: String, qtyPerPulse: Double,
      last: Option[(Double, Long)], // (count so far, last edge millis)
      nowMillis: Long): Seq[Ingest.Reading] =
    last match {
      case Some((count, lastMillis)) =>
        val rate = qtyPerPulse / ((nowMillis - lastMillis).toDouble / 1000.0)
        Seq(
          Ingest.Reading(meterId, seriesName,
            new java.sql.Timestamp(nowMillis - 10L), Seq(count, rate), ""),
          Ingest.Reading(meterId, seriesName,
            new java.sql.Timestamp(nowMillis), Seq(count + qtyPerPulse, rate), ""))
      case None =>
        Seq(Ingest.Reading(meterId, seriesName,
          new java.sql.Timestamp(nowMillis), Seq(qtyPerPulse, 0.0), ""))
    }

  /** S15 — Weewx pipeline: report-page HTML → `#current_widget`
    * label/data rows → the value grammar (F1) → one reading per
    * current-conditions row, all stamped with the page's `.lastupdate`
    * wall-clock resolved through the site zone (P11)
    * (WeewxLogger.cs:37-64). The ragged `Wind` row lands as a
    * 2-element values array [speed, direction°] with a `;`-joined
    * unit, exactly like the reference's variable-arity append.
    */
  def weewxReadingRows(
      meterId: String, html: String,
      zone: java.time.ZoneId): Seq[Ingest.Reading] = {
    import graft.functions.{Html, Parsers}
    Html.firstTextByClass(html, "lastupdate").toSeq.flatMap { stamp =>
      val ts = new java.sql.Timestamp(
        Parsers.weewxLastUpdateMicros(stamp, zone) / 1000L)
      Html.widgetRows(html, "current_widget")
        .flatMap { case (label, data) => Parsers.weewxParse(label, data) }
        .map(i => Ingest.Reading(meterId, i.name, ts, i.values.toSeq, i.unit))
    }
  }

  /** S15 — the station's doc mutation (WeewxLogger.cs:33-55):
    * VendorInfo from the about-widget's Hardware row, Medium =
    * "Weewx" + version.
    */
  def weewxStationInfo(html: String): Option[(String, String)] = {
    val about = graft.functions.Html.widgetRows(html, "about_widget").toMap
    for {
      hw <- about.get("Hardware")
      ver <- about.get("WeeWX version")
    } yield (hw, "Weewx" + ver)
  }

  /** S14 — Tapo device_info identity (TapoLogger.cs:223-246):
    * model/ip/mac plus the base64-encoded nickname decoded to UTF-8.
    */
  case class TapoInfo(model: String, ip: String, mac: String, nick: String)

  // one mapper per JVM — ObjectMapper construction is Jackson's most
  // expensive operation and these decoders run once per poll tick
  private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def tapoDeviceInfo(json: String): Option[TapoInfo] = {
    try {
      val r = mapper.readTree(json).path("device_info").path("result")
      if (r.isMissingNode) None
      else Some(TapoInfo(
        r.path("model").asText,
        r.path("ip").asText,
        r.path("mac").asText,
        graft.functions.Parsers.base64Utf8(r.path("nickname").asText)))
    } catch { case _: Exception => None }
  }

  /** S14 — Tapo pipeline: subprocess JSON (device_info + energy_usage)
    * → the PowerEnergy row the logger appends (TapoLogger.cs:64-85):
    * [power_W, corrected_kWh, raw_kWh] with mW→W and Wh→kWh scaling,
    * tag "W;kWh", timestamp truncated to seconds. `energyOffset` is
    * the meter doc's rolling offset.
    */
  def tapoReadingRows(
      meterId: String, json: String, tsMillis: Long,
      energyOffset: Double): Seq[Ingest.Reading] = {
    try {
      val e = mapper.readTree(json).path("energy_usage").path("result")
      if (e.isMissingNode) Seq.empty
      else {
        // absent fields are NaN like the reference's `?? double.NaN`
        // (TapoLogger.cs:232-233); a present but WRONG-TYPED field
        // aborts the reading — System.Text.Json's GetValue<double> on
        // a string node throws, which the reference catches as a
        // failed poll (no append), so mirror that with an empty batch
        def d(field: String): Double = {
          val n = e.path(field)
          if (n.isMissingNode || n.isNull) Double.NaN
          else if (n.isNumber) n.asDouble
          else throw new IllegalArgumentException(s"non-numeric $field")
        }
        val energyKwh = d("month_energy") / 1000.0
        Seq(Ingest.Reading(meterId, "PowerEnergy",
          new java.sql.Timestamp(tsMillis - tsMillis % 1000L),
          Seq(d("current_power") / 1000.0,
            energyKwh + energyOffset,
            energyKwh),
          "W;kWh"))
      }
    } catch { case _: Exception => Seq.empty }
  }

  /** S14 — the Tapo monthly-reset offset law (TapoLogger.cs:88-107):
    * month_energy resets to 0 at month start, so when the current
    * reading dropped below the last stored RAW reading (both compared
    * at 1 decimal; the last raw is first rounded to 3 like the
    * reference's `Math.Round(..., 3)`), the last raw reading is FOLDED
    * INTO the offset (`offset += last`) — unlike Kasa's `offset =
    * last` lifetime-counter variant (Meters.energyOffsetUpdate).
    * .NET Math.Round is banker's rounding → HALF_EVEN.
    */
  def tapoNewEnergyOffset(
      lastRawKwh: Double, currentKwh: Double, offset: Double): Double = {
    def r(x: Double, d: Int) =
      BigDecimal(x).setScale(d, BigDecimal.RoundingMode.HALF_EVEN).toDouble
    val lastEnergyReading = r(lastRawKwh, 3)
    if (r(currentKwh, 1) < r(lastEnergyReading, 1)) offset + lastEnergyReading
    else offset
  }

  /** S9 — ebus pipeline: whole-tree JSON → the fixed heat-pump series
    * map; each item carries the DEVICE's own lastup stamp, not the
    * poll tick (EbusLogger.cs:70-87). Items whose path is absent are
    * skipped (the reference logs and continues).
    */
  def ebusReadingRows(
      meterId: String, json: String,
      specs: Seq[graft.functions.EbusJson.ItemSpec] =
        graft.functions.EbusJson.standardItems): Seq[Ingest.Reading] = {
    import graft.functions.EbusJson
    val tree = try EbusJson.parse(json) catch { case _: Exception => return Seq.empty }
    specs.flatMap { spec =>
      EbusJson.extract(tree, spec).map { case (tsMillis, value) =>
        Ingest.Reading(meterId, spec.series,
          new java.sql.Timestamp(tsMillis), Seq(value), spec.tag)
      }
    }
  }

  /** S9 — the per-item extra poll (EbusLogger.cs:89-101): of a meter's
    * configured LogItems, only those due under the cadence law (W10)
    * are fetched (`fetch` receives the maxage-bearing URL), and each
    * reply is addressed at `path.Replace("/", ".messages.")`.
    */
  def ebusLogItemRows(
      meterId: String, baseUrl: String,
      items: Seq[(graft.functions.EbusJson.ItemSpec, Long)], // (spec with RAW path, readIntervalMillis)
      lastRead: Map[String, Long],
      nowMillis: Long,
      fetch: String => String): Seq[Ingest.Reading] = {
    import graft.functions.EbusJson
    val due = Harness.dueItems(
      items.map { case (s, interval) => (s.path, interval) }, lastRead, nowMillis).toSet
    items.collect {
      case (spec, intervalMillis) if due(spec.path) =>
        val url = EbusJson.logItemUrl(baseUrl, spec.path, intervalMillis / 1000.0)
        try {
          ebusReadingRows(meterId, fetch(url),
            Seq(EbusJson.logItemSpec(spec.path, spec.series, spec.childPath, spec.tag)))
        } catch { case _: Exception => Seq.empty }
    }.flatten
  }

  /** SDM Modbus pipeline (SdmLogger.cs:79-96): each configured
    * register definition reads a 2-register pair, decodes the IEEE-754
    * float (P7), rounds to 4 decimals (banker's, like .NET
    * Math.Round), adds the per-register offset, and appends under the
    * definition's series/tag with a seconds-truncated timestamp.
    * `readPair` is the edge fetch (register → (hi, lo)); a failed read
    * skips that register.
    */
  def sdmReadingRows(
      meterId: String,
      registers: Seq[graft.Meters.RegisterDef],
      readPair: Int => Option[(Int, Int)],
      tsMillis: Long): Seq[Ingest.Reading] = {
    val ts = new java.sql.Timestamp(tsMillis - tsMillis % 1000L)
    registers.flatMap { d =>
      readPair(d.register).map { case (hi, lo) =>
        val value = graft.functions.Parsers.registerPairToFloat(hi, lo)
        val rounded = BigDecimal(value.toDouble)
          .setScale(4, BigDecimal.RoundingMode.HALF_EVEN).toDouble
        Ingest.Reading(meterId, d.seriesName, ts, Seq(rounded + d.offset), d.tag)
      }
    }
  }

  /** S13 — Kasa pipeline: XOR-autokey ciphertext → JSON → the
    * (power W, energy kWh) reading the logger appends
    * (KasaLogger.cs:42-47). JSON field extraction is driver-free
    * (jackson ships with Spark).
    */
  def kasaReadingRows(
      meterId: String, ciphertext: Array[Byte], tsMillis: Long): Seq[Ingest.Reading] = {
    val json = graft.functions.Parsers.kasaDecrypt(ciphertext)
    try {
      val node = mapper.readTree(json)
      val emeter = node.path("emeter").path("get_realtime")
      if (emeter.isMissingNode) Seq.empty
      else Seq(Ingest.Reading(meterId, "PowerEnergy",
        new java.sql.Timestamp(tsMillis),
        Seq(emeter.path("power_mw").asDouble / 1000.0,
          emeter.path("total_wh").asDouble / 1000.0),
        "W;kWh"))
    } catch { case _: Exception => Seq.empty }
  }
}
