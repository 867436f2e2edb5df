package graft.functions

/** S11/S16 binary frame decoders, re-expressed from the reference's
  * device protocols (SURVEY.md §2.3 F12/F13/F15). Pure functions over
  * byte arrays — ingest-edge only; registered as UDFs when a binary
  * payload column needs decoding.
  */
object BinaryDecoders {

  // -------------------------------------------------------------------
  // Goodwe inverter UDP frame (GoodwePoller.cs:64-99,
  // Goodwe/Extensions.cs:19-42): 153 bytes, header AA 55, trailing
  // little-endian CRC-16/Modbus over bytes [2, len-2), big-endian
  // registers at fixed offsets with ×0.1/×0.01 fixed-point scaling.
  // -------------------------------------------------------------------
  case class GoodweTelemetry(
      year: Int, month: Int, day: Int, hour: Int, minute: Int, second: Int,
      vpv: Double, ipv: Double, vac: Double, iac: Double,
      gridFrequency: Double, powerW: Double, status: Int,
      temperatureC: Double, energyTodayKwh: Double, energyLifetimeKwh: Double)

  def goodweDecode(frame: Array[Byte]): Either[String, GoodweTelemetry] = {
    if (frame.length != 153) return Left(s"got size ${frame.length}, expected 153")
    if ((frame(0) & 0xff) != 0xaa || (frame(1) & 0xff) != 0x55) return Left("wrong header")
    val crc = Parsers.crc16Modbus(frame, 2, frame.length - 4)
    val rxCrc = (frame(151) & 0xff) | ((frame(152) & 0xff) << 8) // little-endian trailer
    if (crc != rxCrc) return Left(f"CRC mismatch: computed $crc%04x, frame $rxCrc%04x")
    def u16(off: Int): Int = Parsers.u16be(frame, off)
    def s10(off: Int): Double = math.rint(u16(off) * 0.1 * 10) / 10
    def s100(off: Int): Double = math.rint(u16(off) * 0.01 * 100) / 100
    Right(GoodweTelemetry(
      year = (frame(5) & 0xff) + 2000, month = frame(6) & 0xff, day = frame(7) & 0xff,
      hour = frame(8) & 0xff, minute = frame(9) & 0xff, second = frame(10) & 0xff,
      vpv = s10(11), ipv = s10(13), vac = s10(41), iac = s10(47),
      gridFrequency = s100(53), powerW = u16(61).toDouble, status = frame(63) & 0xff,
      temperatureC = s10(87), energyTodayKwh = s10(93),
      energyLifetimeKwh = math.rint(Parsers.u32be(frame, 95) * 0.1 * 10) / 10))
  }

  /** P11 — the decoded clock bytes assembled into an instant: the
    * inverter reports site-local wall time (GoodwePoller.cs:84-86
    * builds a DateTimeKind.Local DateTime from the raw bytes).
    */
  def goodweTimestampMicros(t: GoodweTelemetry, zone: java.time.ZoneId): Long =
    Parsers.goodweClockMicros(t.year, t.month, t.day, t.hour, t.minute, t.second, zone)

  /** Build a valid frame from register values — the synthetic-fixture
    * inverse of [[goodweDecode]] (the golden layout has no public
    * sample capture).
    */
  def goodweEncode(t: GoodweTelemetry): Array[Byte] = {
    val b = new Array[Byte](153)
    b(0) = 0xaa.toByte; b(1) = 0x55
    b(5) = (t.year - 2000).toByte; b(6) = t.month.toByte; b(7) = t.day.toByte
    b(8) = t.hour.toByte; b(9) = t.minute.toByte; b(10) = t.second.toByte
    def put16(off: Int, v: Int): Unit = {
      b(off) = ((v >> 8) & 0xff).toByte; b(off + 1) = (v & 0xff).toByte
    }
    put16(11, math.round(t.vpv * 10).toInt); put16(13, math.round(t.ipv * 10).toInt)
    put16(41, math.round(t.vac * 10).toInt); put16(47, math.round(t.iac * 10).toInt)
    put16(53, math.round(t.gridFrequency * 100).toInt)
    put16(61, t.powerW.toInt); b(63) = t.status.toByte
    put16(87, math.round(t.temperatureC * 10).toInt)
    put16(93, math.round(t.energyTodayKwh * 10).toInt)
    val life = math.round(t.energyLifetimeKwh * 10)
    put16(95, ((life >> 16) & 0xffff).toInt); put16(97, (life & 0xffff).toInt)
    val crc = Parsers.crc16Modbus(b, 2, b.length - 4)
    b(151) = (crc & 0xff).toByte; b(152) = ((crc >> 8) & 0xff).toByte
    b
  }

  // -------------------------------------------------------------------
  // ZyAura HID report (ZGm053Service.cs:78-110): 8 bytes, decrypt =
  // position shuffle + per-position XOR key + 3-bit rotate across the
  // buffer − nibble-swapped "Htemp99e" salt; opcode dispatch
  // (ZGm053Service.cs:129-158): 'P' → CO₂ ppm, 'B' → temp raw/16−273.15.
  // -------------------------------------------------------------------
  private val zyKey = Array(0xc4, 0xc6, 0xc0, 0x92, 0x40, 0x23, 0xdc, 0x96).map(_.toByte)
  private val zyShuffle = Array(2, 4, 0, 7, 1, 6, 5, 3)
  private val zySalt = "Htemp99e".getBytes("ASCII")

  def zyauraDecrypt(data: Array[Byte]): Array[Byte] = {
    require(data.length == 8, "ZyAura report is 8 bytes")
    val temp = new Array[Byte](8)
    for (i <- 0 until 8) {
      val di = zyShuffle(i)
      temp(di) = (data(i) ^ zyKey(di)).toByte
    }
    val temp1 = new Array[Byte](8)
    for (i <- 0 until 8) {
      val oi = (i - 1 + 8) & 7
      temp1(i) = ((((temp(i) & 0xff) >> 3) & 31) | ((temp(oi) & 0xff) << 5)).toByte
    }
    val out = new Array[Byte](8)
    for (i <- 0 until 8) {
      val c = zySalt(i) & 0xff
      val ctemp = ((c >> 4) & 15) | ((c << 4) & 0xf0)
      out(i) = (0x100 + (temp1(i) & 0xff) - ctemp).toByte
    }
    out
  }

  /** Inverse of [[zyauraDecrypt]] for synthetic fixtures. */
  def zyauraEncrypt(plain: Array[Byte]): Array[Byte] = {
    require(plain.length == 8)
    val temp1 = new Array[Byte](8)
    for (i <- 0 until 8) {
      val c = zySalt(i) & 0xff
      val ctemp = ((c >> 4) & 15) | ((c << 4) & 0xf0)
      temp1(i) = ((plain(i) & 0xff) + ctemp).toByte
    }
    // undo the 3-bit rotate: temp(i) low 5 bits came from temp1(i)<<3,
    // high 3 bits from temp1((i+1)&7)>>5
    val temp = new Array[Byte](8)
    for (i <- 0 until 8) {
      val hi = (temp1((i + 1) & 7) & 0xff) >> 5
      temp(i) = ((((temp1(i) & 0xff) & 31) << 3) | hi).toByte
    }
    val data = new Array[Byte](8)
    for (i <- 0 until 8) {
      val di = zyShuffle(i)
      data(i) = ((temp(di) & 0xff) ^ (zyKey(di) & 0xff)).toByte
    }
    data
  }

  sealed trait ZyauraReading
  case class Co2Ppm(value: Double) extends ZyauraReading
  case class RoomTemperatureC(value: Double) extends ZyauraReading
  case object Unsupported extends ZyauraReading

  /** Opcode dispatch over a DECRYPTED report (F15). */
  def zyauraParse(plain: Array[Byte]): ZyauraReading = {
    val raw = ((plain(1) & 0xff) << 8) | (plain(2) & 0xff)
    (plain(0) & 0xff).toChar match {
      case 'P' => Co2Ppm(raw.toDouble)
      case 'B' => RoomTemperatureC(raw / 16.0 - 273.15)
      case _ => Unsupported
    }
  }
}
