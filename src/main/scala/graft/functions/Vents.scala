package graft.functions

/** Vents Micra ventilation-unit protocol (S12/F10/F14), re-expressed
  * from the reference's UDP device codec (Vents/Device.cs):
  *
  *  - frame = FD FD | version 0x02 | serialLen serial | passLen pass |
  *    function + TLV payload | sum16 little-endian (F10: additive
  *    16-bit checksum over everything after the 2-byte header,
  *    Device.cs:80-83,131-143);
  *  - TLV item stream with stateful page/size registers (F14,
  *    Device.cs:101-129): 0xFF sets the high address byte, 0xFE sets
  *    the next item's byte width (resets to 1 after each item), 0xFD
  *    skips an unsupported address, anything else is a low address byte
  *    followed by `size` data bytes;
  *  - typed item decoders (ItemDictionaryExtensions.cs): bool / byte /
  *    temperature = little-endian int16 ÷ 10.
  *
  * Pure byte-array functions — the ingest edge; the poll itself is a
  * Structured Streaming source feeding these through a decode UDF.
  */
object Vents {

  val CmdPage = 0xff
  val CmdSize = 0xfe
  val CmdNotSupported = 0xfd
  val FunctionRead = 0x01
  val FunctionReadWrite = 0x03
  val FunctionReplyData = 0x06
  val PacketHeader = 0xfdfd

  /** Named register addresses (Vents/ItemAddress.cs) — the subset the
    * logger polls plus the control registers.
    */
  val ItemAddress: Map[String, Int] = Map(
    "OnOff" -> 1, "SpeedMode" -> 2, "MaxSpeed" -> 3, "Boost" -> 6,
    "Timer" -> 7, "TimerSpeed" -> 8, "TimerCountdown" -> 11,
    "RoomTemperatureSetpoint" -> 24, "RoomTemperatureActual" -> 30,
    "TemperatureOutsideIntake" -> 31, "TemperatureInsideExhaust" -> 32,
    "TemperatureInsideIntake" -> 33, "TemperatureOutsideExhaust" -> 34,
    "SupplySpeed1" -> 58, "ExtractSpeed1" -> 59,
    "SupplySpeed2" -> 60, "ExtractSpeed2" -> 61,
    "SupplySpeed3" -> 62, "ExtractSpeed3" -> 63,
    "SupplySpeed4" -> 64, "ExtractSpeed4" -> 65,
    "SupplySpeed5" -> 66, "ExtractSpeed5" -> 67,
    "SupplySpeedBoost" -> 70, "ExtractSpeedBoost" -> 71,
    "WeeklyScheduleEnabled" -> 114, "WeeklyScheduleSpeed" -> 115,
    "MotorHours" -> 126)

  /** F10 — additive 16-bit checksum (mod 2¹⁶) over [from, until). */
  def sum16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var s = 0
    var i = from
    while (i < until) { s = (s + (bytes(i) & 0xff)) & 0xffff; i += 1 }
    s
  }

  /** Read-command payload with page switching (Device.cs:36-50): 0xFF +
    * page emitted whenever the high address byte changes (initial page
    * register is 0).
    */
  def composeReadPayload(addresses: Seq[Int]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer[Byte](FunctionRead.toByte)
    var page = 0
    for (addr <- addresses) {
      val thisPage = (addr >> 8) & 0xff
      if (thisPage != page) {
        out += CmdPage.toByte += thisPage.toByte
        page = thisPage
      }
      out += (addr & 0xff).toByte
    }
    out.toArray
  }

  /** Full framed command (Device.cs:70-86). */
  def composeCommand(serial: String, password: String, payload: Array[Byte]): Array[Byte] = {
    val sb = serial.getBytes("UTF-8")
    val pb = password.getBytes("UTF-8")
    val body = Array[Byte](
      (PacketHeader & 0xff).toByte, ((PacketHeader >> 8) & 0xff).toByte, 0x02,
      sb.length.toByte) ++ sb ++ Array(pb.length.toByte) ++ pb ++ payload
    val sum = sum16(body, 2, body.length)
    body ++ Array((sum & 0xff).toByte, ((sum >> 8) & 0xff).toByte)
  }

  /** Header + trailing-checksum verification (Device.cs:131-143). */
  def verifyChecksum(buffer: Array[Byte]): Either[String, Unit] = {
    if (buffer.length < 4) return Left(s"frame too short: ${buffer.length}")
    val header = (buffer(0) & 0xff) | ((buffer(1) & 0xff) << 8)
    if (header != PacketHeader) return Left(f"header mismatch, got $header%04x")
    val calc = sum16(buffer, 2, buffer.length - 2)
    val rx = (buffer(buffer.length - 2) & 0xff) | ((buffer(buffer.length - 1) & 0xff) << 8)
    if (calc != rx) Left(f"checksum mismatch: computed $calc%04x, frame $rx%04x")
    else Right(())
  }

  /** F14 — the stateful TLV item stream. The buffer INCLUDES the
    * trailing checksum (the reference parses until ≤2 bytes remain,
    * Device.cs:105).
    */
  def parseItems(buffer: Array[Byte], from: Int): Map[Int, Array[Byte]] = {
    val out = scala.collection.mutable.Map[Int, Array[Byte]]()
    var page = 0
    var size = 1
    var i = from
    while (buffer.length - i > 2) {
      (buffer(i) & 0xff) match {
        case CmdPage => page = buffer(i + 1) & 0xff; i += 2
        case CmdSize => size = buffer(i + 1) & 0xff; i += 2
        case CmdNotSupported => i += 2 // skip the unsupported address
        case low =>
          out((page << 8) | low) = buffer.slice(i + 1, i + 1 + size)
          i += 1 + size
          size = 1
      }
    }
    out.toMap
  }

  /** Full reply parse (Device.cs:88-101): checksum, version 0x02,
    * serial/password echo, function 0x06, then the TLV items.
    */
  def parseReply(buffer: Array[Byte]): Either[String, Map[Int, Array[Byte]]] =
    verifyChecksum(buffer).flatMap { _ =>
      var i = 2
      val version = buffer(i) & 0xff; i += 1
      if (version != 0x02) return Left(s"reply version mismatch: got $version")
      val serialLen = buffer(i) & 0xff; i += 1 + serialLen
      val passLen = buffer(i) & 0xff; i += 1 + passLen
      val function = buffer(i) & 0xff; i += 1
      if (function != FunctionReplyData) return Left(s"reply function mismatch: got $function")
      Right(parseItems(buffer, i))
    }

  /** Synthetic-fixture inverse of [[parseReply]]: frame an item map the
    * way the device would (page/size commands emitted on change), so
    * roundtrip specs prove the parser against the encoder.
    */
  def encodeReply(
      serial: String, password: String, items: Seq[(Int, Array[Byte])]): Array[Byte] = {
    val tlv = scala.collection.mutable.ArrayBuffer[Byte](FunctionReplyData.toByte)
    var page = 0
    for ((addr, data) <- items) {
      val thisPage = (addr >> 8) & 0xff
      if (thisPage != page) {
        tlv += CmdPage.toByte += thisPage.toByte
        page = thisPage
      }
      if (data.length != 1) tlv += CmdSize.toByte += data.length.toByte
      tlv += (addr & 0xff).toByte
      tlv ++= data
    }
    composeCommand(serial, password, tlv.toArray)
  }

  // Typed extractors (ItemDictionaryExtensions.cs) -------------------

  def boolItem(items: Map[Int, Array[Byte]], addr: Int): Boolean = {
    val v = items(addr)
    require(v.length == 1, s"bool item at $addr has ${v.length} bytes")
    v(0) != 0
  }

  def byteItem(items: Map[Int, Array[Byte]], addr: Int): Int = {
    val v = items(addr)
    require(v.length == 1, s"byte item at $addr has ${v.length} bytes")
    v(0) & 0xff
  }

  /** Little-endian int16 ÷ 10 (signed — outdoor temperatures go
    * negative).
    */
  def temperatureItem(items: Map[Int, Array[Byte]], addr: Int): Double = {
    val v = items(addr)
    require(v.length == 2, s"temperature item at $addr has ${v.length} bytes")
    (((v(1) & 0xff) << 8) | (v(0) & 0xff)).toShort / 10.0
  }

  /** Items → the P15 decision-tree input (VentsMicraLogger.cs:98-121);
    * feed to ControlLaws.ventSpeed / ventSpeedPercentages.
    */
  def ventStateOf(items: Map[Int, Array[Byte]]): ControlLaws.VentState =
    ControlLaws.VentState(
      onOff = boolItem(items, ItemAddress("OnOff")),
      speedMode = byteItem(items, ItemAddress("SpeedMode")),
      scheduleEnabled = boolItem(items, ItemAddress("WeeklyScheduleEnabled")),
      scheduleSpeed = byteItem(items, ItemAddress("WeeklyScheduleSpeed")),
      timer = boolItem(items, ItemAddress("Timer")),
      timerSpeed = byteItem(items, ItemAddress("TimerSpeed")),
      boost = boolItem(items, ItemAddress("Boost")))

  /** The (supply, extract) fan percentages for a decided speed level
    * (VentsMicraLogger.cs:124-161), read from the per-level registers.
    */
  def speedPercentages(items: Map[Int, Array[Byte]], speed: Int): (Double, Double) =
    ControlLaws.ventSpeedPercentages(
      speed,
      (1 to 5).map(n => (
        byteItem(items, ItemAddress(s"SupplySpeed$n")).toDouble,
        byteItem(items, ItemAddress(s"ExtractSpeed$n")).toDouble)),
      (byteItem(items, ItemAddress("SupplySpeedBoost")).toDouble,
        byteItem(items, ItemAddress("ExtractSpeedBoost")).toDouble))

  /** One poll → the reading rows the logger appends
    * (VentsMicraLogger.cs:83-95): exhaust/outside temperature, the
    * decided speed (+ mode tag), and the fan percentage pair.
    */
  def pollReadings(items: Map[Int, Array[Byte]]): Seq[(String, Seq[Double], String)] = {
    val (speed, tag) = ControlLaws.ventSpeed(ventStateOf(items))
    val (supply, extract) = speedPercentages(items, speed)
    Seq(
      ("ExhaustTemperature",
        Seq(temperatureItem(items, ItemAddress("TemperatureOutsideExhaust"))), ""),
      ("OutsideTemperature",
        Seq(temperatureItem(items, ItemAddress("TemperatureOutsideIntake"))), ""),
      ("Speed", Seq(speed.toDouble), tag),
      ("FanSpeedPercentages", Seq(supply, extract), "supply;extract"))
  }
}
