package graft.datasets

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Impute
import PipelineOps._

/** UDS (user daily summary) pipeline — the nested-data showcase.
  *
  * Reference semantics: wrangling notebook UDS cells — expand
  * `allDayStress` (N2), take the TOTAL element of `aggregatorList`
  * (N3: the notebook keeps it POSITIONALLY via `iloc[:, :-2]` + rename;
  * here it's the order-independent higher-order
  * `filter(list, x -> x.type == 'TOTAL')[0]`, which the raw data
  * confirms is equivalent — TOTAL is always present), drop the ~40
  * insignificant columns (P1 — expressed here by never reading them:
  * the explicit schema IS the projection), zero-fill isVigorousDay,
  * mean-fill (A8), float→int truncation casts (F21), F5 calendar
  * features, golden column order.
  */
object UdsPipeline {

  private val totalFields = Seq(
    "averageStressLevel", "averageStressLevelIntensity", "maxStressLevel",
    "stressIntensityCount", "stressOffWristCount", "totalStressCount",
    "totalStressIntensity", "stressDuration", "stressTooActiveCount",
    "restDuration", "activityDuration", "mediumDuration", "highDuration")

  private val directNumeric = Seq(
    "totalKilocalories", "activeKilocalories", "bmrKilocalories",
    "totalSteps", "totalDistanceMeters", "highlyActiveSeconds",
    "activeSeconds", "moderateIntensityMinutes", "vigorousIntensityMinutes",
    "minHeartRate", "maxHeartRate", "restingHeartRate",
    "currentDayRestingHeartRate")

  val finalColumns: Seq[String] =
    Seq("calendarDate", "Year", "Month", "MonthName", "Quarter", "Day") ++
      directNumeric ++ Seq("isVigorousDay") ++ totalFields

  def clean(spark: SparkSession,
            rawDir: String = GarminRaw.defaultRawDir,
            impute: Boolean = true): DataFrame = {
    val dated = GarminRaw.uds(spark, rawDir)
      .withColumn("calendarDate", to_date(col("calendarDate")))

    // N3: the TOTAL element, by tag not by position.
    val total: Column = get(
      filter(col("allDayStress.aggregatorList"),
        x => x.getField("type") === lit("TOTAL")), lit(0))
    val expanded = totalFields.foldLeft(
        dated.withColumn("__total", total)) { (d, f) =>
        d.withColumn(f, col("__total").getField(f))
      }
      .drop("__total", "allDayStress")

    // Zero-fill the vigorous-day flag (bool -> 0/1 double pre-cast).
    val flagged = expanded.withColumn("isVigorousDay",
      coalesce(col("isVigorousDay").cast("double"), lit(0.0)))

    // A8 mean-fill, then pandas astype(int) == truncation-toward-zero.
    val filled = if (impute) Impute.meanFill(flagged) else flagged
    val ints = (directNumeric ++ Seq("isVigorousDay") ++ totalFields)
      .foldLeft(filled)((d, c) => d.withColumn(c, col(c).cast("long")))

    withCalendarFeatures(ints, "calendarDate")
      .select(finalColumns.map(col): _*)
  }
}
