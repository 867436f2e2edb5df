package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ControlLaws
import graft.functions.ControlLaws.RunExtenderConfig

/** W7 decision table — the reference's exact xunit InlineData rows
  * (/root/reference/TelemetryTests/EbusRunExtenderTests.cs:24-46).
  */
class ControlLawsSpec extends AnyFunSuite {

  private val base = RunExtenderConfig(
    desiredModulation = 5, minimumFlowTemperature = 24, maximumFlowTemperature = 30)

  private def check(cfg: RunExtenderConfig)(
      mod: Double, curMin: Double, desired: Double, actual: Double, expected: Double): Unit = {
    val got = ControlLaws.runExtender(mod, curMin, desired, actual, cfg)
    if (expected.isNaN) assert(got.isNaN, s"($mod,$curMin,$desired,$actual) -> $got, want NaN")
    else assert(got == expected, s"($mod,$curMin,$desired,$actual) -> $got, want $expected")
  }

  test("ParseTableItem rows (DesiredModulation=5)") {
    val c = check(base) _
    c(0, 24, 24, 25, 25.5) // extend the run when overshooting Ta
    c(0, 26, 0, 22, 24) // reset when undershooting with no heat request
    c(0, 23, 0, 15, 24) // raise to configured minimum when below it
    c(0, 23, 23, 23.5, 24)
    c(0, 24, 24, 24.5, 25) // extend the run when on minimum
  }

  test("ManageModulation rows (DesiredModulation=10)") {
    val c = check(base.copy(desiredModulation = 10)) _
    c(9, 24, 25, 25, 25.5)
    c(20, 26, 26, 26, 25.5)
    c(5, 30, 30, 30, Double.NaN)
    c(20, 25, 26, 26, Double.NaN)
  }

  test("setpoint guard suppresses out-of-range and deadband writes") {
    assert(ControlLaws.setpointGuard(25.5, 24, base).contains(25.5))
    assert(ControlLaws.setpointGuard(23.0, 24, base).isEmpty) // below floor
    assert(ControlLaws.setpointGuard(30.5, 24, base).isEmpty) // above ceiling
    assert(ControlLaws.setpointGuard(24.2, 24, base).isEmpty) // deadband
    assert(ControlLaws.setpointGuard(Double.NaN, 24, base).isEmpty)
  }

  test("time-of-day window predicate") {
    val periods = Seq((3600L, 7200L), (80000L, 85000L))
    assert(ControlLaws.inAnyPeriod(3600, periods))
    assert(ControlLaws.inAnyPeriod(7200, periods))
    assert(!ControlLaws.inAnyPeriod(7201, periods))
    assert(ControlLaws.inAnyPeriod(84000, periods))
    assert(!ControlLaws.inAnyPeriod(0, periods))
  }

  test("vent speed decision tree (P15, VentsMicraLogger.cs:98-161)") {
    import ControlLaws.{VentState, ventSpeed, ventSpeedPercentages}
    val base = VentState(onOff = true, speedMode = 2,
      scheduleEnabled = false, scheduleSpeed = 3,
      timer = false, timerSpeed = 4, boost = false)
    assert(ventSpeed(base.copy(onOff = false)) == (0, "off"))
    assert(ventSpeed(base) == (2, "on"))
    assert(ventSpeed(base.copy(scheduleEnabled = true)) == (3, "schedule"))
    // timer overrides schedule; boost overrides everything
    assert(ventSpeed(base.copy(scheduleEnabled = true, timer = true)) == (4, "timer"))
    assert(ventSpeed(base.copy(timer = true, boost = true)) == (6, "boost"))
    // off wins even with boost requested
    assert(ventSpeed(base.copy(onOff = false, boost = true)) == (0, "off"))

    val table = IndexedSeq((20.0, 25.0), (40.0, 45.0), (60.0, 65.0),
      (80.0, 85.0), (90.0, 95.0))
    assert(ventSpeedPercentages(0, table, (100.0, 100.0)) == (0.0, 0.0))
    assert(ventSpeedPercentages(3, table, (100.0, 100.0)) == (60.0, 65.0))
    assert(ventSpeedPercentages(6, table, (100.0, 100.0)) == (100.0, 100.0))
    assertThrows[IllegalArgumentException](ventSpeedPercentages(7, table, (0.0, 0.0)))
  }

  test("thermostat decision follows the switcher's arm order") {
    import ControlLaws.thermostatDecision
    // warm + off-period -> thermostat regardless of data volume
    assert(thermostatDecision(6.0, 2.0, inOffPeriod = true, 5.0, 0,
      allOnRecent = false, allOffRecent = false).contains("thermostat"))
    // warm + room satisfied (diff < 0.7) -> thermostat even in an on-period
    assert(thermostatDecision(6.0, 0.5, inOffPeriod = false, 5.0, 0,
      allOnRecent = false, allOffRecent = false).contains("thermostat"))
    // warm but on-period and room wants heat -> falls through to the
    // trailing-window arms (insufficient data here)
    assert(thermostatDecision(6.0, 2.0, inOffPeriod = false, 5.0, 5,
      allOnRecent = true, allOffRecent = false).isEmpty)
    // cold + long runtime -> thermostat (prevent overshoot)
    assert(thermostatDecision(2.0, 2.0, inOffPeriod = false, 5.0, 20,
      allOnRecent = true, allOffRecent = false).contains("thermostat"))
    // cold + long offtime -> modulating (prevent cold floors)
    assert(thermostatDecision(2.0, 2.0, inOffPeriod = false, 5.0, 20,
      allOnRecent = false, allOffRecent = true).contains("modulating"))
    // cold, mixed recent activity -> no-op
    assert(thermostatDecision(2.0, 2.0, inOffPeriod = false, 5.0, 20,
      allOnRecent = false, allOffRecent = false).isEmpty)
  }
}
