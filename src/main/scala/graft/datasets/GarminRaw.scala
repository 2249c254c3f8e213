package graft.datasets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import graft.sources.JsonSources

/** Raw readers for the Garmin export tree (SURVEY §1.1 table), with
  * EXPLICIT schemas per dataset — schema inference would need a second
  * pass over the corpus and drifts per file (SURVEY §1.2). Fields the
  * pipelines drop unread (napList, bodyBattery, respiration, …) are
  * simply absent from the schemas: not reading them IS the drop, and it
  * prunes the JSON parse itself.
  *
  * `rawDir` is the export root; files are discovered by glob (S1),
  * mirroring `ETL Scripts/aggregate_json_files.py:134-143` patterns.
  */
object GarminRaw {

  /** Default to the reference's committed raw export (read-only input
    * data used as golden-test fixtures).
    */
  val defaultRawDir: String = sys.env.getOrElse("GRAFT_GARMIN_RAW_DIR",
    "/root/reference/ETL Scripts/PBI Python Scripts/Raw Data")

  val sleepSchema: StructType = StructType(Seq(
    StructField("calendarDate", StringType),
    StructField("sleepStartTimestampGMT", StringType),
    StructField("sleepEndTimestampGMT", StringType),
    StructField("sleepWindowConfirmationType", StringType),
    StructField("retro", BooleanType),
    StructField("deepSleepSeconds", DoubleType),
    StructField("lightSleepSeconds", DoubleType),
    StructField("remSleepSeconds", DoubleType),
    StructField("awakeSleepSeconds", DoubleType),
    StructField("unmeasurableSeconds", DoubleType),
    StructField("averageRespiration", DoubleType),
    StructField("lowestRespiration", DoubleType),
    StructField("highestRespiration", DoubleType),
    StructField("awakeCount", DoubleType),
    StructField("avgSleepStress", DoubleType),
    StructField("restlessMomentCount", DoubleType),
    StructField("sleepScores", StructType(Seq(
      StructField("overallScore", DoubleType),
      StructField("qualityScore", DoubleType),
      StructField("durationScore", DoubleType),
      StructField("recoveryScore", DoubleType),
      StructField("deepScore", DoubleType),
      StructField("remScore", DoubleType),
      StructField("lightScore", DoubleType),
      StructField("awakeningsCountScore", DoubleType),
      StructField("awakeTimeScore", DoubleType),
      StructField("combinedAwakeScore", DoubleType),
      StructField("restfulnessScore", DoubleType),
      StructField("interruptionsScore", DoubleType),
      StructField("feedback", StringType),
      StructField("insight", StringType))))))

  val atlSchema: StructType = StructType(Seq(
    StructField("userProfilePK", LongType),
    StructField("calendarDate", StringType), // epoch-ms OR string per file; overridden from timestamp
    StructField("deviceId", LongType),
    StructField("timestamp", LongType),      // epoch ms
    StructField("acwrStatus", StringType),
    StructField("acwrStatusFeedback", StringType),
    StructField("dailyTrainingLoadAcute", DoubleType),
    StructField("dailyTrainingLoadChronic", DoubleType),
    StructField("acwrPercent", DoubleType),
    StructField("dailyAcuteChronicWorkloadRatio", DoubleType)))

  val maxmetSchema: StructType = StructType(Seq(
    StructField("userProfilePK", LongType),
    StructField("calendarDate", StringType),
    StructField("deviceId", LongType),
    StructField("updateTimestamp", StringType),
    StructField("sport", StringType),
    StructField("subSport", StringType),
    StructField("vo2MaxValue", DoubleType),
    StructField("maxMet", DoubleType),
    StructField("maxMetCategory", LongType),
    StructField("calibratedData", BooleanType)))

  val racePredSchema: StructType = StructType(Seq(
    StructField("userProfilePK", LongType),
    StructField("calendarDate", StringType),
    StructField("deviceId", LongType),
    StructField("timestamp", StringType),
    StructField("raceTime5K", LongType),
    StructField("raceTime10K", LongType),
    StructField("raceTimeHalf", LongType),
    StructField("raceTimeMarathon", LongType)))

  val trainingHistSchema: StructType = StructType(Seq(
    StructField("userProfilePK", LongType),
    StructField("calendarDate", StringType),
    StructField("deviceId", LongType),
    StructField("timestamp", StringType),
    StructField("trainingStatus", StringType),
    StructField("fitnessLevelTrend", StringType),
    StructField("trainingStatus2FeedbackPhrase", StringType),
    StructField("sport", StringType),
    StructField("subSport", StringType)))

  /** TOTAL-element shape of allDayStress.aggregatorList (N3 target). */
  val stressAggregatorSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("averageStressLevel", DoubleType),
    StructField("averageStressLevelIntensity", DoubleType),
    StructField("maxStressLevel", DoubleType),
    StructField("stressIntensityCount", DoubleType),
    StructField("stressOffWristCount", DoubleType),
    StructField("totalStressCount", DoubleType),
    StructField("totalStressIntensity", DoubleType),
    StructField("stressDuration", DoubleType),
    StructField("stressTooActiveCount", DoubleType),
    StructField("restDuration", DoubleType),
    StructField("activityDuration", DoubleType),
    StructField("mediumDuration", DoubleType),
    StructField("highDuration", DoubleType),
    StructField("lowDuration", DoubleType),
    StructField("uncategorizedDuration", DoubleType),
    StructField("totalDuration", DoubleType)))

  val udsSchema: StructType = StructType(Seq(
    StructField("calendarDate", StringType),
    StructField("totalKilocalories", DoubleType),
    StructField("activeKilocalories", DoubleType),
    StructField("bmrKilocalories", DoubleType),
    StructField("totalSteps", DoubleType),
    StructField("totalDistanceMeters", DoubleType),
    StructField("highlyActiveSeconds", DoubleType),
    StructField("activeSeconds", DoubleType),
    StructField("moderateIntensityMinutes", DoubleType),
    StructField("vigorousIntensityMinutes", DoubleType),
    StructField("minHeartRate", DoubleType),
    StructField("maxHeartRate", DoubleType),
    StructField("restingHeartRate", DoubleType),
    StructField("currentDayRestingHeartRate", DoubleType),
    StructField("isVigorousDay", BooleanType),
    StructField("allDayStress", StructType(Seq(
      StructField("aggregatorList", ArrayType(stressAggregatorSchema)))))))

  private def scan(spark: SparkSession, rawDir: String, glob: String,
                   schema: StructType): DataFrame =
    JsonSources.scanJsonArrays(spark, s"$rawDir/$glob", schema)

  def sleep(spark: SparkSession, rawDir: String = defaultRawDir): DataFrame =
    scan(spark, rawDir, "*/DI_CONNECT/DI-Connect-Wellness/*sleepData.json",
      sleepSchema)

  def atl(spark: SparkSession, rawDir: String = defaultRawDir): DataFrame =
    scan(spark, rawDir,
      "*/DI_CONNECT/DI-Connect-Metrics/MetricsAcuteTrainingLoad_*.json",
      atlSchema)

  def maxmet(spark: SparkSession, rawDir: String = defaultRawDir): DataFrame =
    scan(spark, rawDir,
      "*/DI_CONNECT/DI-Connect-Metrics/MetricsMaxMetData_*.json", maxmetSchema)

  def racePredictions(spark: SparkSession,
                      rawDir: String = defaultRawDir): DataFrame =
    scan(spark, rawDir,
      "*/DI_CONNECT/DI-Connect-Metrics/RunRacePredictions_*.json",
      racePredSchema)

  def trainingHistory(spark: SparkSession,
                      rawDir: String = defaultRawDir): DataFrame =
    scan(spark, rawDir,
      "*/DI_CONNECT/DI-Connect-Metrics/TrainingHistory_*.json",
      trainingHistSchema)

  def uds(spark: SparkSession, rawDir: String = defaultRawDir): DataFrame =
    scan(spark, rawDir, "*/DI_CONNECT/DI-Connect-Aggregator/UDSFile_*.json",
      udsSchema)
}
