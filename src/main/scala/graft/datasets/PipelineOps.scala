package graft.datasets

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared column helpers for the Garmin dataset pipelines, pinned to the
  * exact formatting the reference's pandas chain produced (these feed
  * golden-file comparisons, so the formats are semantics, not style).
  */
object PipelineOps {

  /** round(x, 1) with CPython semantics (binary-exact value, ties to
    * even) — the rounding that produced the golden files. Backed by the
    * custom Catalyst expression [[graft.expressions.PyRound]]: no Spark
    * built-in matches (round/bround work on the shortest decimal repr),
    * and a quick floor(x*10+0.5) emulation fails on true binary ties
    * (0.25*10 is exactly 2.5, which must round to 0.2, while 1.05*10
    * also lands on exactly 10.5 yet must round to 1.1).
    */
  def pyRound1(c: Column): Column = graft.expressions.PyRound(c, 1)

  /** round(x, 1) with NUMPY semantics (pandas Series.round): multiply by
    * 10 in fp, round half-to-even on the PRODUCT, divide. Differs from
    * [[pyRound1]] exactly when the multiply's rounding error crosses a
    * tie: 7.35 is stored below 7.35 (CPython rounds to 7.3) but
    * 7.35*10 lands on exactly 73.5 (numpy gives 7.4). The reference
    * used Series.round for sleepDurationHours and a Python-round
    * `.apply` for the stage columns, and the goldens pin each.
    * `bround` rounds the shortest decimal repr half-even, which agrees
    * with rint on every half case (k.5 is always binary-exact).
    */
  def npRound1(c: Column): Column = bround(c * 10.0, 0) / 10.0

  /** Seconds -> "HH:MM:SS" with zero-padded hours (str(pd.Timedelta)
    * tail). Distinct from TimeFns.secondsToHms, which renders hours
    * unpadded per the reference's `_format_duration`. Null-propagating
    * (format_string would render null args as the string "null").
    */
  def hmsPadded(secs: Column): Column = {
    val s = secs.cast("long")
    when(s.isNotNull,
      format_string("%02d:%02d:%02d",
        floor((s % 86400L) / 3600).cast("long"),
        floor((s % 3600L) / 60).cast("long"),
        s % 60L))
  }

  /** Seconds -> full str(pd.Timedelta) form: "N days HH:MM:SS". */
  def pandasDurationString(secs: Column): Column =
    when(secs.isNotNull,
      format_string("%d days %s",
        floor(secs.cast("long") / 86400L).cast("long"), hmsPadded(secs)))

  /** F5 calendar features exactly as the notebook adds them:
    * Year, Month, MonthName (full English), Quarter, Day — inserted
    * right after `dateCol` by the callers' final select.
    */
  def calendarFeatureCols(dateCol: Column): Seq[(String, Column)] = Seq(
    "Year"      -> year(dateCol),
    "Month"     -> month(dateCol),
    "MonthName" -> date_format(dateCol, "MMMM"),
    "Quarter"   -> quarter(dateCol),
    "Day"       -> dayofmonth(dateCol))

  def withCalendarFeatures(df: DataFrame, dateCol: String): DataFrame =
    calendarFeatureCols(col(dateCol)).foldLeft(df) {
      case (d, (n, c)) => d.withColumn(n, c)
    }
}
