package graft.functions

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.Element
import scala.jdk.CollectionConverters._

/** F4 — M-Bus XML decode, re-expressed from the reference's consumption
  * logic (/root/reference/TelemetryToRaven/Mbus/MbusLogger.cs:55-95,
  * MBusData.cs:7-41; golden shape Mbus/mbus_sample.xml). Pure JDK DOM —
  * usable driver-side or as an ingest-edge UDF; the query engine never
  * sees XML, only the reading rows this emits.
  *
  * Record-id → series map (MbusLogger.cs:82-95):
  *   1 → HeatEnergyRaw [kWh] ×1, 9 → FlowTemperature [°C] ×0.01,
  *   10 → ReturnTemperature [°C] ×0.01, 12 → Power [W] ×100,
  *   13 → VolumeFlow [m³/h] ×1, plus the derived
  *   CalculatedPower = [round(4186·ΔT·flow/3600), ΔT] with
  *   ΔT = (raw_flow − raw_return)·0.01.
  *
  * Sample quirks handled: sentinel −2147483648 values and bogus dates
  * (ids 2-5) are simply never consumed because only the mapped ids are
  * read — same behavior as the reference's dictionary lookups.
  */
object MbusXml {

  case class SlaveInfo(id: String, manufacturer: String, medium: String)
  case class DataRecord(id: Int, unit: String, value: String, timestamp: String) {
    def numeric: Double = value.toDoubleOption.getOrElse(Double.NaN)
  }
  case class MbusReading(series: String, values: Array[Double], tag: String, timestamp: String)

  def parse(xml: String): (SlaveInfo, Map[Int, DataRecord]) = {
    val dbf = DocumentBuilderFactory.newInstance()
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = dbf.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("ISO-8859-1")))

    def text(e: Element, tag: String): String = {
      val nl = e.getElementsByTagName(tag)
      if (nl.getLength == 0) "" else nl.item(0).getTextContent
    }

    val slaveEl = doc.getElementsByTagName("SlaveInformation").item(0).asInstanceOf[Element]
    val slave = SlaveInfo(text(slaveEl, "Id"), text(slaveEl, "Manufacturer"),
      text(slaveEl, "Medium"))
    val nodes = doc.getElementsByTagName("DataRecord")
    val records = (0 until nodes.getLength).map { i =>
      val e = nodes.item(i).asInstanceOf[Element]
      val r = DataRecord(e.getAttribute("id").toInt, text(e, "Unit"),
        text(e, "Value"), text(e, "Timestamp"))
      r.id -> r
    }.toMap
    (slave, records)
  }

  /** The six reading rows MbusLogger materializes per poll. */
  def readings(xml: String): Seq[MbusReading] = {
    val (_, r) = parse(xml)
    val flow = r(9)
    val ret = r(10)
    val vol = r(13)
    val dT = (flow.numeric - ret.numeric) * 0.01
    val power = 4186.0 * dT * (vol.numeric / 3600.0)
    Seq(
      MbusReading("HeatEnergyRaw", Array(r(1).numeric * 1.0), "kWh", r(1).timestamp),
      MbusReading("FlowTemperature", Array(flow.numeric * 0.01), "°C", flow.timestamp),
      MbusReading("ReturnTemperature", Array(ret.numeric * 0.01), "°C", ret.timestamp),
      MbusReading("VolumeFlow", Array(vol.numeric * 1.0), "m³/h", vol.timestamp),
      MbusReading("Power", Array(r(12).numeric * 100.0), "W", r(12).timestamp),
      MbusReading("CalculatedPower", Array(math.round(power).toDouble, dT), "W;K",
        vol.timestamp))
  }
}
