package graft.datasets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Profile, Scaffold}
import PipelineOps._

/** The four daily-metric pipelines (SURVEY §1.1): acute training load,
  * max-met, race predictions, training history. Reference semantics:
  * `ETL Scripts/transform_all_datasets.py:151-292` refined by the
  * wrangling notebook cells that produced the golden CSVs.
  */
object MetricsPipelines {

  /** ATL: NONE-status filter (P5), calendarDate derived from the epoch-ms
    * timestamp (F3/F4 — the raw calendarDate field drifts between epoch
    * and string encodings across files), null-ratio filter (P6),
    * keep-latest-per-day dedup (A10), ML column drops (P1).
    */
  def atl(spark: SparkSession,
          rawDir: String = GarminRaw.defaultRawDir): DataFrame = {
    val base = GarminRaw.atl(spark, rawDir)
      .filter(col("acwrStatus") =!= "NONE")
      .withColumn("calendarDate", to_date(timestamp_millis(col("timestamp"))))
      .drop("deviceId")
      .filter(col("dailyAcuteChronicWorkloadRatio").isNotNull)
    Dedup.keepLatest(base, Seq("calendarDate"), col("timestamp"))
      .select(col("calendarDate"), col("acwrStatus"),
        col("dailyTrainingLoadAcute"), col("dailyTrainingLoadChronic"),
        col("acwrPercent"), col("dailyAcuteChronicWorkloadRatio"))
  }

  /** MaxMet: P4 single-value pruning, keep-latest-per-day by update
    * timestamp (ISO strings order lexicographically = chronologically),
    * J2 date-scaffold densification, W3 whole-row forward fill.
    * The ffill window is unpartitioned BY DESIGN: it runs over the daily
    * spine (one row per day), which is bounded — never over a fact table.
    */
  def maxmet(spark: SparkSession,
             rawDir: String = GarminRaw.defaultRawDir): DataFrame = {
    val dated = GarminRaw.maxmet(spark, rawDir)
      .withColumn("calendarDate", to_date(col("calendarDate")))
    val pruned = Profile.pruneUninformative(dated,
      dropAllNull = false, dropSingleValue = true)
    val dedup = Dedup.keepLatest(pruned, Seq("calendarDate"),
      col("updateTimestamp"))
    val spine = Scaffold.dateSpine(dedup, "calendarDate", "calendarDate")
    val dense = spine.join(dedup, Seq("calendarDate"), "left")
    val w = Window.orderBy(col("calendarDate"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense.select(
      col("calendarDate"),
      last(col("vo2MaxValue"), ignoreNulls = true).over(w).as("vo2MaxValue"),
      last(col("maxMet"), ignoreNulls = true).over(w).as("maxMet"))
  }

  /** Race predictions: per-day group-min of the four race times (A1),
    * padded H:MM:SS renderings (F10), F5 calendar features, golden order.
    */
  def racePredictions(spark: SparkSession,
                      rawDir: String = GarminRaw.defaultRawDir): DataFrame = {
    val times = Seq("raceTime5K", "raceTime10K", "raceTimeHalf",
      "raceTimeMarathon")
    val mins = GarminRaw.racePredictions(spark, rawDir)
      .withColumn("calendarDate", to_date(col("calendarDate")))
      .groupBy(col("calendarDate"))
      .agg(min(col(times.head)).as(times.head),
        times.tail.map(c => min(col(c)).as(c)): _*)
    val withTd = times.foldLeft(mins)((d, c) =>
      d.withColumn(s"${c}_timedelta", hmsPadded(col(c))))
    withCalendarFeatures(withTd, "calendarDate").select(
      (Seq("calendarDate", "Year", "Month", "MonthName", "Quarter", "Day") ++
        times ++ times.map(c => s"${c}_timedelta")).map(col): _*)
  }

  /** Training history: keep-latest-per-day (A10) THEN status filter (P5)
    * — the notebook's order, which can differ from filter-then-dedup when
    * the latest intra-day record is NO_STATUS.
    */
  def trainingHistory(spark: SparkSession,
                      rawDir: String = GarminRaw.defaultRawDir): DataFrame = {
    val dated = GarminRaw.trainingHistory(spark, rawDir)
      .withColumn("calendarDate", to_date(col("calendarDate")))
    Dedup.keepLatest(dated, Seq("calendarDate"), col("timestamp"))
      .filter(col("trainingStatus") =!= "NO_STATUS")
      .select(col("calendarDate"), col("trainingStatus"),
        col("fitnessLevelTrend"))
  }
}
