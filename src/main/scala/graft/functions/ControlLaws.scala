package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, when}

/** Pure control-law functions from the reference's closed-loop services,
  * extracted exactly as its unit tests pin them down (SURVEY.md §2.6
  * W7/W8). Pure ⇒ decision-table testable, and usable either driver-side
  * or inside `when()` chains over as-of-joined latest values.
  */
object ControlLaws {

  case class RunExtenderConfig(
      desiredModulation: Double,
      minimumFlowTemperature: Double,
      maximumFlowTemperature: Double)

  /** Heat-pump run-extender law
    * (/root/reference/TelemetryToRaven/Ebus/EbusRunExtender.cs:63-97,
    * decision table TelemetryTests/EbusRunExtenderTests.cs:24-46).
    * Returns the new minimum-flow-temperature setpoint, NaN = no action.
    *
    *   1. held minimum below configured floor          → reset to floor
    *   2. no heat requested while minimum is raised    → reset to floor
    *   3. under-modulating while flow tracks desired   → raise by 0.5 K
    *   4. over-modulating (> desired+5) at/below setpt → lower by 0.5 K
    *
    * Note: the reference source raises to `desiredFlow + 0.5`
    * (EbusRunExtender.cs:83) but its own decision table expects
    * `actualFlow + 0.5` (test row (0,24,24,25)→25.5 — desired+0.5 would
    * give 24.5). The table is the behavioral spec, so we follow it.
    */
  def runExtender(
      modulation: Double,
      currentMinimum: Double,
      desiredFlow: Double,
      actualFlow: Double,
      cfg: RunExtenderConfig): Double = {
    if (currentMinimum < cfg.minimumFlowTemperature)
      cfg.minimumFlowTemperature
    else if (desiredFlow < 1 && currentMinimum > cfg.minimumFlowTemperature)
      cfg.minimumFlowTemperature
    else if (modulation < cfg.desiredModulation &&
      actualFlow < cfg.maximumFlowTemperature &&
      actualFlow >= desiredFlow && desiredFlow >= 1)
      actualFlow + 0.5
    else if (modulation > cfg.desiredModulation + 5 &&
      actualFlow > cfg.minimumFlowTemperature &&
      actualFlow <= desiredFlow && desiredFlow <= currentMinimum)
      currentMinimum - 0.5
    else Double.NaN
  }

  /** Column-expression twin of [[runExtender]] so the control law can
    * run inside a query plan over as-of-joined latest values (NaN = no
    * action, like the scalar version). Kept in lockstep by
    * ControlLawsSpec's equivalence test.
    */
  def runExtenderColumn(
      modulation: org.apache.spark.sql.Column,
      currentMinimum: org.apache.spark.sql.Column,
      desiredFlow: org.apache.spark.sql.Column,
      actualFlow: org.apache.spark.sql.Column,
      cfg: RunExtenderConfig): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, when}
    when(currentMinimum < cfg.minimumFlowTemperature, lit(cfg.minimumFlowTemperature))
      .when(desiredFlow < 1 && currentMinimum > cfg.minimumFlowTemperature,
        lit(cfg.minimumFlowTemperature))
      .when(modulation < cfg.desiredModulation &&
        actualFlow < cfg.maximumFlowTemperature &&
        actualFlow >= desiredFlow && desiredFlow >= 1,
        actualFlow + 0.5)
      .when(modulation > cfg.desiredModulation + 5 &&
        actualFlow > cfg.minimumFlowTemperature &&
        actualFlow <= desiredFlow && desiredFlow <= currentMinimum,
        currentMinimum - 0.5)
      .otherwise(lit(Double.NaN))
  }

  /** Production setpoint guard (EbusRunExtender.cs:99-108): suppress the
    * write when out of [floor, ceiling] or within the 0.4 K deadband of
    * the currently-held minimum.
    */
  def setpointGuard(
      newMinimum: Double,
      currentMinimum: Double,
      cfg: RunExtenderConfig): Option[Double] =
    if (newMinimum.isNaN ||
      newMinimum < cfg.minimumFlowTemperature ||
      newMinimum > cfg.maximumFlowTemperature ||
      math.abs(newMinimum - currentMinimum) < 0.4) None
    else Some(newMinimum)

  /** Time-of-day window predicate (ref EbusThermostatSwitcher.cs:84-92):
    * true if `secondsOfDay` falls inside any [on, off] period.
    */
  def inAnyPeriod(secondsOfDay: Long, periods: Seq[(Long, Long)]): Boolean =
    periods.exists { case (on, off) => secondsOfDay >= on && secondsOfDay <= off }

  /** Ventilation speed-mode decision tree — P15
    * (ref VentsMicraLogger.cs:98-121): later modes override earlier
    * ones (on < schedule < timer < boost), everything off ⇒ (0, "off").
    */
  case class VentState(
      onOff: Boolean, speedMode: Int,
      scheduleEnabled: Boolean, scheduleSpeed: Int,
      timer: Boolean, timerSpeed: Int,
      boost: Boolean)

  def ventSpeed(s: VentState): (Int, String) =
    if (!s.onOff) (0, "off")
    else if (s.boost) (6, "boost")
    else if (s.timer) (s.timerSpeed, "timer")
    else if (s.scheduleEnabled) (s.scheduleSpeed, "schedule")
    else (s.speedMode, "on")

  /** Per-mode register select (VentsMicraLogger.cs:124-161): the speed
    * level picks which (supply, extract) percentage pair applies;
    * speeds 1-5 index the table, 6 is the boost pair, 0 is off.
    */
  def ventSpeedPercentages(
      speed: Int,
      table: IndexedSeq[(Double, Double)], // levels 1..5
      boostPair: (Double, Double)): (Double, Double) =
    speed match {
      case 0 => (0.0, 0.0)
      case 6 => boostPair
      case n if n >= 1 && n <= 5 => table(n - 1)
      case n => throw new IllegalArgumentException(s"speed $n")
    }

  /** W8 — thermostat mode decision, faithful to
    * EbusThermostatSwitcher.cs:50-81:
    *
    *  - warm outside (> permanentSwitchTemperature) AND (inside an OFF
    *    period OR the room is within 0.7° of setpoint) → "thermostat"
    *    (plain on/off control, no insufficient-data guard on this arm);
    *  - otherwise, over the trailing max(minOn, minOff) window of flow
    *    setpoints: < 10 points → no-op (A13 guard); all recent
    *    setpoints > 0 ("long runtime") → "thermostat" to prevent
    *    overshoot; all recent ≤ 0 ("long offtime") → "modulating" to
    *    prevent cold floors; else no-op.
    *
    * Returns Some(newMode) or None for no-op.
    */
  def thermostatDecision(
      outsideTemp: Double,
      roomDiff: Double, // setpoint − actual room temperature
      inOffPeriod: Boolean,
      permanentSwitchTemperature: Double,
      nSetpoints: Int,
      allOnRecent: Boolean,
      allOffRecent: Boolean): Option[String] =
    if (outsideTemp > permanentSwitchTemperature && (inOffPeriod || roomDiff < 0.7))
      Some("thermostat")
    else if (nSetpoints < 10) None
    else if (allOnRecent) Some("thermostat")
    else if (allOffRecent) Some("modulating")
    else None

  /** Column-expression twin of [[thermostatDecision]] (no-op → the
    * literal "no-op" so the decision is SQL-comparable end-to-end).
    */
  def thermostatDecisionColumn(
      outsideTemp: Column,
      roomDiff: Column,
      inOffPeriod: Column,
      permanentSwitchTemperature: Column,
      nSetpoints: Column,
      allOnRecent: Column,
      allOffRecent: Column): Column =
    when(outsideTemp > permanentSwitchTemperature &&
      (inOffPeriod || roomDiff < 0.7), lit("thermostat"))
      .when(nSetpoints < 10, lit("no-op"))
      .when(allOnRecent, lit("thermostat"))
      .when(allOffRecent, lit("modulating"))
      .otherwise(lit("no-op"))
}
