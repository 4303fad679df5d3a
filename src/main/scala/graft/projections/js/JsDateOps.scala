package graft.projections.js

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

/** Deterministic ECMAScript Date calendar math for the projection engine.
  *
  * The reference's Jint engine ships full ES including `Date`
  * (JintProjectionStateHandler.cs handlers run arbitrary ES), and real
  * handlers do time bucketing (`new Date(e.body.ts).getUTCHours()`). Those
  * ARGUMENT-CONSTRUCTED forms are pure functions of their inputs, so they
  * replay deterministically; only the wall-clock forms (`Date.now()`,
  * no-arg `new Date()`) are nondeterministic and stay banned (JsInterp
  * raises the determinism error).
  *
  * Divergences from full ES, all documented and deterministic:
  *  - The engine is UTC-pinned (SparkSession timeZone=UTC): local-time
  *    getters (`getHours`...) alias their UTC twins, `getTimezoneOffset`
  *    is 0, and offset-less ISO date-TIMES parse as UTC (ES would use the
  *    host zone — nondeterministic across executors, so UTC is the only
  *    sound choice).
  *  - `toString` renders the ISO form, not the locale "Day Mon DD ..."
  *    form (host-dependent in ES).
  *  - Only the ES ISO-8601 interchange format parses; other inputs give an
  *    Invalid Date (NaN), where ES leaves them implementation-defined.
  */
object JsDateOps {

  /** ES TimeClip: finite, |t| <= 8.64e15 ms, truncated toward zero. */
  def timeClip(d: Double): Double =
    if (d.isNaN || d.isInfinite || math.abs(d) > 8.64e15) Double.NaN
    else if (d < 0) math.ceil(d)
    else math.floor(d)

  private def utc(ms: Double): LocalDateTime =
    LocalDateTime.ofInstant(Instant.ofEpochMilli(ms.toLong), ZoneOffset.UTC)

  /** One UTC calendar field; NaN in → NaN out (Invalid Date getters). */
  def field(ms: Double, name: String): Double =
    if (ms.isNaN) Double.NaN
    else {
      val t = utc(ms)
      val v: Int = name match {
        case "year" => t.getYear
        case "month" => t.getMonthValue - 1 // ES months are 0-based
        case "date" => t.getDayOfMonth
        case "day" => t.getDayOfWeek.getValue % 7 // ES: Sunday = 0
        case "hours" => t.getHour
        case "minutes" => t.getMinute
        case "seconds" => t.getSecond
        case "milliseconds" => t.getNano / 1000000
      }
      v.toDouble
    }

  /** ES legacy two-digit-year mapping — constructor and Date.UTC ONLY
    * (Date.parse of "0050-01-01" must NOT become 1950). */
  def legacyYear(y: Double): Double =
    if (y >= 0 && y <= 99 && y == math.floor(y)) 1900 + y else y

  /** ES MakeDay/MakeTime/TimeClip for Date.UTC and the multi-argument
    * constructor: out-of-range months/days roll over (month 12 = January
    * of the next year), exactly like ES. */
  def partsToMs(y: Double, mo: Double, d: Double, h: Double, mi: Double,
      s: Double, msArg: Double): Double = {
    if (Seq(y, mo, d, h, mi, s, msArg).exists(x => x.isNaN || x.isInfinite))
      return Double.NaN
    val yr = y
    try {
      val yi = Math.toIntExact(yr.toLong + Math.floorDiv(mo.toLong, 12L))
      val moi = Math.floorMod(mo.toLong, 12L).toInt // 0-based
      val days = LocalDate.of(yi, moi + 1, 1).toEpochDay + (d.toLong - 1)
      timeClip(days * 86400000.0 + h.toLong * 3600000.0 + mi.toLong * 60000.0 +
        s.toLong * 1000.0 + msArg.toLong)
    } catch { case _: RuntimeException => Double.NaN }
  }

  // ES Date Time String Format (ECMA-262 21.4.1.18): YYYY[-MM[-DD]]
  // optionally followed by THH:mm[:ss[.sss]][Z|±HH:MM]. We additionally
  // tolerate a space separator, compact ±HHMM offsets, and 1..9 fraction
  // digits (truncated to ms) — all common in real event payloads.
  private val IsoRe =
    ("^(\\d{4}|[+-]\\d{6})(?:-(\\d{2})(?:-(\\d{2}))?)?" +
      "(?:[T ](\\d{2}):(\\d{2})(?::(\\d{2})(?:\\.(\\d{1,9}))?)?" +
      "(Z|z|[+-]\\d{2}:?\\d{2})?)?$").r

  /** ES Date.parse for the ISO interchange format; anything else → NaN
    * (Invalid Date). Offset-less times are UTC (engine zone pin). */
  def parse(str: String): Double = str.trim match {
    case IsoRe(y, mo, d, h, mi, s, frac, off) =>
      val ms =
        if (frac == null) 0.0
        else (frac + "00").substring(0, 3).toDouble
      val base = partsToMs(
        y.toDouble,
        if (mo == null) 0.0 else mo.toDouble - 1,
        if (d == null) 1.0 else d.toDouble,
        if (h == null) 0.0 else h.toDouble,
        if (mi == null) 0.0 else mi.toDouble,
        if (s == null) 0.0 else s.toDouble,
        ms)
      // calendar-field validity (month 13, hour 25): parse rejects where
      // the constructor would roll over
      if (base.isNaN ||
        (mo != null && (mo.toInt < 1 || mo.toInt > 12)) ||
        (d != null && (d.toInt < 1 ||
          d.toInt > java.time.YearMonth.of(y.toInt, mo.toInt).lengthOfMonth())) ||
        (h != null && (h.toInt > 24 ||
          (h.toInt == 24 && (mi.toInt != 0 ||
            (s != null && s.toInt != 0) || ms != 0.0)))) ||
        (mi != null && mi.toInt > 59) || (s != null && s.toInt > 59)) Double.NaN
      else if (off == null || off == "Z" || off == "z") base
      else {
        val sign = if (off.charAt(0) == '-') -1 else 1
        val digits = off.substring(1).replace(":", "")
        val offMin = digits.substring(0, 2).toInt * 60 + digits.substring(2).toInt
        timeClip(base - sign * offMin * 60000.0)
      }
    case _ => Double.NaN
  }

  /** Date.prototype.toISOString; Invalid Date throws the ES RangeError
    * (catchable — it's a JsError). */
  def toIso(ms: Double): String = {
    if (ms.isNaN) throw new JsError("RangeError: Invalid time value")
    val t = utc(ms)
    val y = t.getYear
    val yStr =
      if (y >= 0 && y <= 9999) f"$y%04d"
      else if (y > 9999) f"+$y%06d"
      else f"-${-y}%06d" // expanded years, ES 21.4.4.36
    f"$yStr-${t.getMonthValue}%02d-${t.getDayOfMonth}%02dT" +
      f"${t.getHour}%02d:${t.getMinute}%02d:${t.getSecond}%02d" +
      f".${t.getNano / 1000000}%03dZ"
  }
}
