package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ControlLaws, Vents}

/** Vents Micra codec: F10 sum-16 checksum, F14 stateful TLV parse,
  * command framing, typed extractors, and the poll → readings mapping.
  */
class VentsSpec extends AnyFunSuite {

  private def A(name: String) = Vents.ItemAddress(name)

  test("sum16 checksum: golden values and frame verification (F10)") {
    assert(Vents.sum16(Array[Byte](1, 2, 3), 0, 3) == 6)
    assert(Vents.sum16(Array.fill[Byte](300)(0xff.toByte), 0, 300) == (300 * 255) % 65536)
    val cmd = Vents.composeCommand("0011", "pass", Array[Byte](0x01, 0x03))
    assert(Vents.verifyChecksum(cmd).isRight)
    // header is FD FD
    assert((cmd(0) & 0xff) == 0xfd && (cmd(1) & 0xff) == 0xfd)
    // any corrupted byte flips the sum
    val bad = cmd.clone(); bad(5) = (bad(5) ^ 0x01).toByte
    assert(Vents.verifyChecksum(bad).isLeft)
    // wrong header is rejected before the sum
    val hdr = cmd.clone(); hdr(0) = 0x00
    assert(Vents.verifyChecksum(hdr).left.exists(_.contains("header")))
  }

  test("command layout: version, length-prefixed serial/password, page switching") {
    val payload = Vents.composeReadPayload(Seq(1, 2, 0x16a, 0x16b, 3))
    // read function, addr 1, addr 2, page switch to 1, 6a, 6b, page stays
    // (the reference does NOT switch back for later low-page addresses
    // unless the page differs — addr 3 on page 0 needs a switch back)
    assert(payload.map(_ & 0xff).toSeq ==
      Seq(0x01, 1, 2, 0xff, 1, 0x6a, 0x6b, 0xff, 0, 3))
    val cmd = Vents.composeCommand("AB", "xy", payload)
    val expectHead = Seq(0xfd, 0xfd, 0x02, 2, 'A'.toInt, 'B'.toInt, 2, 'x'.toInt, 'y'.toInt)
    assert(cmd.take(9).map(_ & 0xff).toSeq == expectHead)
  }

  test("TLV reply roundtrip: pages, sizes, reset-to-1 semantics (F14)") {
    val items = Seq(
      A("OnOff") -> Array[Byte](1),
      A("TemperatureOutsideIntake") -> Array[Byte](0xd2.toByte, 0x00), // 21.0
      A("SpeedMode") -> Array[Byte](3),
      0x16a -> Array[Byte](7, 8, 9), // high page, 3-byte item
      A("MotorHours") -> Array[Byte](0x10))
    val frame = Vents.encodeReply("0011", "pw", items)
    val parsed = Vents.parseReply(frame)
    assert(parsed.isRight)
    val m = parsed.toOption.get
    assert(m.keySet == items.map(_._1).toSet)
    items.foreach { case (addr, data) => assert(m(addr).toSeq == data.toSeq) }
    // a version tamper breaks the checksum first; re-framing with a
    // non-0x06 function is rejected at the function check
    val badV = frame.clone(); badV(2) = 0x03
    assert(Vents.verifyChecksum(badV).isLeft)
    val wrongFn = Vents.composeCommand("0011", "pw", Array[Byte](0x01, 1, 5))
    assert(Vents.parseReply(wrongFn).left.exists(_.contains("function")))
  }

  test("not-supported marker skips one address byte") {
    // hand-build: function 0x06, item 1=5, FD <addr>, item 2=9
    val tlv = Array[Byte](0x06, 1, 5, 0xfd.toByte, 30, 2, 9)
    val frame = Vents.composeCommand("s", "p", tlv)
    val m = Vents.parseReply(frame).toOption.get
    assert(m.keySet == Set(1, 2))
    assert(m(1).toSeq == Seq[Byte](5) && m(2).toSeq == Seq[Byte](9))
  }

  test("typed extractors: bool, byte, signed LE temperature") {
    val items = Map(
      1 -> Array[Byte](1),
      2 -> Array[Byte](0xfa.toByte),
      31 -> Array[Byte](0xd2.toByte, 0x00), // 210 -> 21.0
      34 -> Array[Byte](0xce.toByte, 0xff.toByte)) // -50 -> -5.0
    assert(Vents.boolItem(items, 1))
    assert(Vents.byteItem(items, 2) == 250)
    assert(Vents.temperatureItem(items, 31) == 21.0)
    assert(Vents.temperatureItem(items, 34) == -5.0)
    intercept[IllegalArgumentException](Vents.temperatureItem(items, 1))
  }

  test("poll readings mirror the logger's appends (speed tree + percentages)") {
    def b(v: Int) = Array[Byte](v.toByte)
    val items = Map(
      A("OnOff") -> b(1), A("SpeedMode") -> b(2),
      A("WeeklyScheduleEnabled") -> b(0), A("WeeklyScheduleSpeed") -> b(4),
      A("Timer") -> b(0), A("TimerSpeed") -> b(5), A("Boost") -> b(1),
      A("TemperatureOutsideIntake") -> Array[Byte](0x64, 0x00), // 10.0
      A("TemperatureOutsideExhaust") -> Array[Byte](0xc8.toByte, 0x00), // 20.0
      A("SupplySpeed1") -> b(20), A("ExtractSpeed1") -> b(21),
      A("SupplySpeed2") -> b(30), A("ExtractSpeed2") -> b(31),
      A("SupplySpeed3") -> b(40), A("ExtractSpeed3") -> b(41),
      A("SupplySpeed4") -> b(50), A("ExtractSpeed4") -> b(51),
      A("SupplySpeed5") -> b(60), A("ExtractSpeed5") -> b(61),
      A("SupplySpeedBoost") -> b(90), A("ExtractSpeedBoost") -> b(95))
    val rows = Vents.pollReadings(items).map(r => r._1 -> r).toMap
    // boost wins the mode priority -> speed 6, boost registers
    assert(rows("Speed")._2 == Seq(6.0) && rows("Speed")._3 == "boost")
    assert(rows("FanSpeedPercentages")._2 == Seq(90.0, 95.0))
    assert(rows("OutsideTemperature")._2 == Seq(10.0))
    assert(rows("ExhaustTemperature")._2 == Seq(20.0))
    // encode -> parse -> same decision (roundtrip through the wire format)
    val frame = Vents.encodeReply("0011", "pw", items.toSeq.sortBy(_._1))
    val reparsed = Vents.parseReply(frame).toOption.get
    assert(ControlLaws.ventSpeed(Vents.ventStateOf(reparsed)) == (6, "boost"))
  }
}
