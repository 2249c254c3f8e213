package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Duration / pace / calendar scalar functions (SURVEY §2.4 F2–F15).
  *
  * Reference semantics: `ETL Scripts/transform_running_data.py:140-201`,
  * `ETL Scripts/extract_json_data.py:168-205`,
  * `ETL Scripts/transform_all_datasets.py:15-29,313-340`.
  *
  * All of these are pure `Column` combinators over Spark built-ins, so every
  * expression stays inside whole-stage codegen and Catalyst can constant-fold
  * / push down around them. Internal duration representation is SECONDS as
  * LongType (SURVEY §7.4#4); formatting happens only at the sink.
  */
object TimeFns {

  /** F6 — drop fractional seconds: "mm:ss.f" -> "mm:ss". */
  def dropMilliseconds(c: Column): Column = substring_index(c, ".", 1)

  /** F7 — "M:SS" or "MM:SS" -> total seconds (long). Null on malformed. */
  def mmssToSeconds(c: Column): Column = {
    val p = split(c, ":")
    when(size(p) === 2,
      element_at(p, 1).cast("long") * 60 + element_at(p, 2).cast("long"))
  }

  /** F8 — standardize to h:mm:ss: 2-part "35:54" -> "0:35:54", 3-part kept. */
  def standardizeHms(c: Column): Column =
    when(size(split(c, ":")) === 2, concat(lit("0:"), c)).otherwise(c)

  /** F9 — "H:MM:SS" (or "MM:SS") string -> total seconds (long). */
  def hmsToSeconds(c: Column): Column = {
    val std = standardizeHms(dropMilliseconds(c))
    val p   = split(std, ":")
    when(size(p) === 3,
      element_at(p, 1).cast("long") * 3600 +
        element_at(p, 2).cast("long") * 60 +
        element_at(p, 3).cast("long"))
  }

  /** F10/F11 — seconds -> "H:MM:SS" (no leading zero on hours, like the
    * reference's `_format_duration` / `clean_timedelta_to_string`).
    */
  def secondsToHms(c: Column): Column = {
    val s = c.cast("long")
    // Column./ is floating-point division; use floor+cast for integral parts
    format_string("%d:%02d:%02d",
      floor(s / 3600).cast("long"),
      floor((s % 3600) / 60).cast("long"),
      s % 60)
  }

  /** F12 — speed (m/s) -> pace "M:SS" min/km; null for non-positive speed. */
  def paceFromSpeed(speed: Column): Column = {
    val secPerKm = round(lit(1000.0) / speed).cast("long")
    when(speed > 0,
      format_string("%d:%02d", floor(secPerKm / 60).cast("long"), secPerKm % 60))
  }

  /** F13 — pace "MM:SS" -> seconds (reference prepends "00:"). */
  def paceToSeconds(c: Column): Column = mmssToSeconds(c)

  /** F3 — epoch milliseconds -> timestamp (null-safe cast first). */
  def epochMillisToTimestamp(c: Column): Column =
    timestamp_millis(c.cast("long"))

  /** F14 — duration between two timestamps, in seconds. */
  def durationSeconds(start: Column, end: Column): Column =
    unix_timestamp(end) - unix_timestamp(start)
}
