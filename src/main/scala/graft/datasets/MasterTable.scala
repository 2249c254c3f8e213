package graft.datasets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Daily master table (SURVEY §2.7 J1): N-way full-outer join of the
  * cleaned datasets on calendarDate + the ML notebook's post-join
  * cleaning. Reference: `ML Python Scripts/ML_Master_Table_Merge.ipynb`
  * — reduce-merge on calendarDate (cell 9), drop rows without a
  * trainingStatus (cell 12), forward-fill vo2MaxValue/maxMet (cell 14),
  * zero-fill run distance + IsRunDay flag (cells 17/21).
  *
  * The notebook joins trimmed "Processed_Data" projections that are not
  * committed in the reference; this builds from our cleaned datasets with
  * compact projections (documented divergence — the join/clean operators
  * are the parity surface, the exact ML column subset is not
  * reconstructible from the published tree).
  *
  * Scale posture: the daily frames are small relative to a fact table —
  * AQE broadcasts them; with N large fact-side inputs the join key would
  * be pre-partitioned on calendarDate so the N-way join shares one
  * exchange (SURVEY §7.4#8).
  */
object MasterTable {

  def build(spark: SparkSession,
            rawDir: String = GarminRaw.defaultRawDir): DataFrame = {
    val atl    = MetricsPipelines.atl(spark, rawDir)
    val maxmet = MetricsPipelines.maxmet(spark, rawDir)
    val race   = MetricsPipelines.racePredictions(spark, rawDir)
      .select("calendarDate", "raceTime5K", "raceTime10K", "raceTimeHalf",
        "raceTimeMarathon")
    val sleep  = SleepPipeline.clean(spark, rawDir)
      .select("calendarDate", "sleepDurationHours", "deepSleepHours",
        "lightSleepHours", "remSleepHours", "awakeSleepHours",
        "averageRespiration", "avgSleepStress", "overallScore")
    val th      = MetricsPipelines.trainingHistory(spark, rawDir)
    val uds     = UdsPipeline.clean(spark, rawDir)
      .select("calendarDate", "totalSteps", "totalKilocalories",
        "activeKilocalories", "restingHeartRate", "averageStressLevel",
        "highDuration", "mediumDuration")
    val running = RunningPipeline.forMaster(spark)
      .select("calendarDate", "Distance", "RunTime")

    val joined = Seq(atl, maxmet, race, running, sleep, th, uds)
      .reduce(_.join(_, Seq("calendarDate"), "full_outer"))

    // Post-join cleaning per the ML notebook: keep status-bearing days,
    // ffill the sparse fitness metrics, zero-fill run fields, flag run
    // days (F20/F22).
    val w = Window.orderBy(col("calendarDate"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .filter(col("trainingStatus").isNotNull)
      .withColumn("vo2MaxValue",
        last(col("vo2MaxValue"), ignoreNulls = true).over(w))
      .withColumn("maxMet", last(col("maxMet"), ignoreNulls = true).over(w))
      .withColumn("Distance", coalesce(col("Distance"), lit(0.0)))
      .withColumn("RunTime", coalesce(col("RunTime"), lit("00:00:00")))
      .withColumn("IsRunDay", when(col("Distance") > 0.0, 1).otherwise(0))
  }
}
