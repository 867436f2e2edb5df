package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** The ebusd JSON tree navigation of the S9 HTTP connector
  * (ref `TelemetryToRaven/Ebus/EbusLogger.cs:70-124`): a whole-tree
  * poll is mapped through dotted paths to series rows — each record
  * carries its own device-side `lastup` stamp (epoch seconds), and a
  * per-item `ChildPath` picks the value out of the record's fields.
  */
object EbusJson {

  private val mapper = new ObjectMapper()

  def parse(json: String): JsonNode = mapper.readTree(json)

  /** Dotted-path descent (`EbusLogger.cs:113-119` GetChild): one key
    * per segment; numeric segments also index arrays so both ebusd
    * shapes (`fields` as object with "0","1" keys or as array) walk.
    * Returns a missing node when any hop is absent.
    */
  def getChild(node: JsonNode, path: String): JsonNode =
    path.split('.').foldLeft(node) { (n, key) =>
      if (n.isArray && key.forall(_.isDigit)) n.path(key.toInt)
      else n.path(key)
    }

  /** Record timestamp: UnixEpoch + `lastup` seconds
    * (`EbusLogger.cs:121-124`), in millis.
    */
  def recordTimestampMillis(record: JsonNode): Option[Long] = {
    val lastup = record.path("lastup")
    if (lastup.isNumber) Some(math.round(lastup.asDouble * 1000.0)) else None
  }

  /** One configured series extraction: tree path → record, record's
    * lastup → timestamp, child path → double value. `tag` may be null
    * (the reference appends a null tag for unitless items).
    */
  case class ItemSpec(path: String, series: String, childPath: String, tag: String)

  /** The fixed series map of the heat-pump poll
    * (`EbusLogger.cs:70-87` appendSerie calls, in source order).
    */
  val standardItems: Seq[ItemSpec] = Seq(
    ItemSpec("broadcast.messages.outsidetemp", "OutsideTemp", "fields.temp2.value", "°C"),
    ItemSpec("hmu.messages.FlowTemp", "FlowTemperature", "fields.0.value", "°C"),
    ItemSpec("hmu.messages.ReturnTemp", "ReturnTemperature", "fields.0.value", "°C"),
    ItemSpec("hmu.messages.SetMode", "DesiredFlowTemperature", "fields.flowtempdesired.value", "°C"),
    ItemSpec("hmu.messages.CircuitBuildingWaterPressure", "CircuitPressure", "fields.0.value", "bar"),
    ItemSpec("hmu.messages.CompressorSpeed", "CompressorSpeed", "fields.0.value", "Hz"),
    ItemSpec("hmu.messages.EnergyIntegral", "EnergyIntegral", "fields.energyintegral.value", "°Cmin"),
    ItemSpec("hmu.messages.State", "Modulation", "fields.0.value", "%"),
    ItemSpec("hmu.messages.State", "ThermalEnergyToday", "fields.1.value", "*100W"),
    ItemSpec("hmu.messages.State", "onoff", "fields.2.value", null),
    ItemSpec("hmu.messages.State", "State", "fields.3.value", null),
    ItemSpec("720.messages.z1RoomTemp", "RoomTemperature", "fields.tempv.value", "°C"),
    ItemSpec("720.messages.z1ActualRoomTempDesired", "DesiredRoomTemperature", "fields.tempv.value", "°C"),
    ItemSpec("720.messages.Hc1MinFlowTempDesired", "MinimumFlowTemp", "fields.tempv.value", "°C"),
    ItemSpec("720.messages.HwcStorageTemp", "DHWBoilerTemperature", "fields.tempv.value", "°C"))

  /** A meter's extra LogItem config mapped to its tree path: the
    * per-item fetch URL is `{base}/{path}?maxage={0.8·interval}` and
    * the returned subtree is addressed at `path.Replace("/",
    * ".messages.")` (`EbusLogger.cs:89-101`).
    */
  def logItemSpec(
      path: String, series: String, childPath: String, tag: String): ItemSpec =
    ItemSpec(path.replace("/", ".messages."), series, childPath, tag)

  def logItemUrl(baseUrl: String, path: String, readIntervalSeconds: Double): String =
    s"$baseUrl/$path?maxage=${graft.streaming.Harness.maxAgeSeconds(readIntervalSeconds)}"

  /** One item's (timestampMillis, value), or None when the path is
    * absent / non-numeric — the reference logs and skips the item.
    */
  def extract(tree: JsonNode, spec: ItemSpec): Option[(Long, Double)] = {
    val record = getChild(tree, spec.path)
    for {
      ts <- recordTimestampMillis(record)
      v = getChild(record, spec.childPath)
      if v.isNumber
    } yield (ts, v.asDouble)
  }
}
