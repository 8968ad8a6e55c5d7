package graft.regularize

import java.time.{DayOfWeek, LocalDate, LocalDateTime, ZoneOffset}
import java.time.temporal.WeekFields

/** Driver-side calendar flooring replicating the reference's
  * `floor_datetime` (traces/utils.py:91-128) bit-exactly, including its
  * quirks:
  *   - weeks: ISO week number fed through Python's `"%Y %W %w"` strptime —
  *     Monday-start week-of-year counting from Jan 1 of dt.year (NOT the
  *     ISO week-based year), so year-boundary weeks floor oddly; reproduced.
  *   - days: `dt.day - dt.day % n` (1-based day with 0-mod arithmetic).
  * Only the scalar *bin origin* needs this (bins then step by a fixed
  * timedelta, traces/utils.py:76-88); all per-row flooring in the rollup
  * tiers uses uniform-µs cell arithmetic from that origin.
  */
object CalendarFloor {

  final val MICROS_PER_SECOND = 1000000L
  final val HOUR = 3600L * MICROS_PER_SECOND
  final val DAY = 24L * HOUR
  final val WEEK = 7L * DAY

  def unitMicros(unit: String, nUnits: Int): Long = unit match {
    case "weeks"   => nUnits * WEEK
    case "days"    => nUnits * DAY
    case "hours"   => nUnits * HOUR
    case "minutes" => nUnits * 60L * MICROS_PER_SECOND
    case "seconds" => nUnits * MICROS_PER_SECOND
    case other => throw new IllegalArgumentException(
      s"unit '$other' has no fixed duration (reference datetime_range only supports timedelta units)")
  }

  def toMicros(dt: LocalDateTime): Long = {
    val epochSec = dt.toEpochSecond(ZoneOffset.UTC)
    epochSec * MICROS_PER_SECOND + dt.getNano / 1000L
  }

  def fromMicros(us: Long): LocalDateTime =
    LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, MICROS_PER_SECOND),
      (Math.floorMod(us, MICROS_PER_SECOND) * 1000L).toInt,
      ZoneOffset.UTC)

  /** Python `datetime(year, W, w=Monday)` via `"%Y %W %w"`:
    * julian = 1 + week0Length + 7*(W-1) where
    * week0Length = (7 - weekday(Jan 1)) % 7 (Monday=0).
    * (CPython Lib/_strptime.py `_calc_julian_from_U_or_W`.)
    */
  private def mondayOfPythonWeek(year: Int, week: Int): LocalDate = {
    val jan1 = LocalDate.of(year, 1, 1)
    val firstWeekday = jan1.getDayOfWeek.getValue - 1 // Monday = 0
    val week0Length = (7 - firstWeekday) % 7
    val julian = 1 + week0Length + 7 * (week - 1)
    LocalDate.ofYearDay(year, 1).plusDays(julian - 1L)
  }

  /** floor_datetime(dt, unit, n_units) — traces/utils.py:91-128. */
  def floorDatetime(dt: LocalDateTime, unit: String, nUnits: Int = 1): LocalDateTime =
    unit match {
      case "years" =>
        val newYear = dt.getYear - (dt.getYear - 1) % nUnits
        LocalDateTime.of(newYear, 1, 1, 0, 0, 0)
      case "months" =>
        val newMonth = dt.getMonthValue - (dt.getMonthValue - 1) % nUnits
        LocalDateTime.of(dt.getYear, newMonth, 1, 0, 0, 0)
      case "weeks" =>
        val isoWeek = dt.toLocalDate.get(WeekFields.ISO.weekOfWeekBasedYear())
        val newWeek = isoWeek - (isoWeek - 1) % nUnits
        mondayOfPythonWeek(dt.getYear, newWeek).atStartOfDay()
      case "days" =>
        val newDay = dt.getDayOfMonth - dt.getDayOfMonth % nUnits
        LocalDateTime.of(dt.getYear, dt.getMonthValue, newDay, 0, 0, 0)
      case "hours" =>
        val newHour = dt.getHour - dt.getHour % nUnits
        LocalDateTime.of(dt.getYear, dt.getMonthValue, dt.getDayOfMonth, newHour, 0, 0)
      case "minutes" =>
        val newMin = dt.getMinute - dt.getMinute % nUnits
        LocalDateTime.of(dt.getYear, dt.getMonthValue, dt.getDayOfMonth, dt.getHour, newMin, 0)
      case "seconds" =>
        val newSec = dt.getSecond - dt.getSecond % nUnits
        LocalDateTime.of(dt.getYear, dt.getMonthValue, dt.getDayOfMonth, dt.getHour, dt.getMinute, newSec)
      case other =>
        throw new IllegalArgumentException(s"Unknown unit type $other")
    }

  def floorMicros(us: Long, unit: String, nUnits: Int = 1): Long =
    toMicros(floorDatetime(fromMicros(us), unit, nUnits))

  /** Reference `weekday_number` (traces/utils.py:158-176): name or number
    * -> 0-6 (Monday=0). Reproduces the reference's falsy-zero quirk: its
    * `number_to_day.get(weekday) or day_to_number.get(...)` treats Monday's
    * 0 as falsy and falls through to the name lookup, so integer 0 resolves
    * via name_to_number("monday") — same result by accident; a LOWERCASE
    * "monday" string works, but an unknown name raises, as there. */
  def weekdayNumber(weekday: Any): Int = {
    val names = Seq("monday", "tuesday", "wednesday", "thursday", "friday",
      "saturday", "sunday")
    weekday match {
      case i: Int if i >= 0 && i <= 6 => i
      case s: String if names.contains(s.toLowerCase) => names.indexOf(s.toLowerCase)
      case other => throw new IllegalArgumentException(s"unknown weekday $other")
    }
  }

  /** Bin boundaries: floored start stepping by the fixed unit duration
    * while < end (reference datetime_range + pairwise dropping the partial
    * tail, traces/timeseries.py:855-866 + traces/utils.py:76-88). Returns
    * the boundary list b_0..b_m; bins are [b_i, b_{i+1}) for i < m.
    */
  def binBoundaries(startUs: Long, endUs: Long, unit: String, nUnits: Int = 1): Seq[Long] = {
    val b0 = floorMicros(startUs, unit, nUnits)
    val step = unitMicros(unit, nUnits)
    val b = Seq.newBuilder[Long]
    var cur = b0
    while (cur < endUs) { b += cur; cur += step }
    b.result()
  }
}
