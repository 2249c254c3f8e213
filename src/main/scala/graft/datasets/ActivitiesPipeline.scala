package graft.datasets

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.JsonSources

/** summarized_activities / running_data extraction over the committed
  * raw Garmin export (SURVEY §1.1 rows 1-2; `ETL Scripts/
  * extract_json_data.py:97-205` semantics on the REAL export's field
  * names — the committed extractor assumes `activityType.typeKey`
  * dicts, but the actual export carries plain strings, which is why the
  * reference needed its hand-"Cleaned" file workaround; Spark's
  * explicit schema reads the file as-is).
  *
  * Chain: S3 envelope explode → P11 typed projection (the schema IS the
  * projection) → F3 epoch-ms timestamps → F15 unit conversions
  * (cm→km /100000, ms→s /1000, cm/ms→m/s ×10,
  * `transform_all_datasets.py:318-340`) → F11 "H:MM:SS" duration and
  * F12 pace strings with the extractor's int()-TRUNCATION semantics
  * (`_format_duration`/`_format_pace` truncate, they do not round).
  * All map-only; no shuffle until a consumer aggregates.
  */
object ActivitiesPipeline {

  val innerSchema: StructType = StructType(Seq(
    StructField("activityId", LongType),
    StructField("activityType", StringType),
    StructField("name", StringType),
    StructField("sportType", StringType),
    StructField("beginTimestamp", LongType),
    StructField("startTimeLocal", DoubleType), // epoch ms, float in raw
    StructField("distance", DoubleType),       // centimeters
    StructField("duration", DoubleType),       // milliseconds
    StructField("movingDuration", DoubleType), // milliseconds
    StructField("avgSpeed", DoubleType),       // cm/ms
    StructField("maxSpeed", DoubleType),       // cm/ms
    StructField("calories", DoubleType),
    StructField("avgHr", DoubleType),
    StructField("maxHr", DoubleType),
    StructField("steps", DoubleType),
    StructField("elevationGain", DoubleType),  // centimeters
    StructField("avgStrideLength", DoubleType),
    StructField("favorite", BooleanType),
    StructField("deviceId", LongType),
    StructField("locationName", StringType),
    StructField("vO2MaxValue", DoubleType)))

  private val exportGlob =
    "*/DI_CONNECT/DI-Connect-Fitness/*summarizedActivities*.json"

  /** `_format_duration`: ms -> "H:MM:SS", int-truncated; 0/null -> 0:00:00. */
  private def hmsFromMs(ms: Column): Column = {
    val s = (ms / 1000.0).cast("long")
    when(ms.isNull || ms === 0.0, lit("0:00:00"))
      .otherwise(format_string("%d:%02d:%02d",
        floor(s / 3600).cast("long"),
        floor((s % 3600) / 60).cast("long"), s % 60))
  }

  /** `_format_pace`: cm/ms -> "M:SS" min/km, int-truncated; 0/null -> 0:00. */
  private def paceFromCmMs(v: Column): Column = {
    val secPerKm = (lit(1000.0) / (v * 10.0)).cast("long")
    when(v.isNull || v <= 0.0, lit("0:00"))
      .otherwise(format_string("%d:%02d",
        floor(secPerKm / 60).cast("long"), secPerKm % 60))
  }

  /** The full summarized_activities table, one row per activity. */
  def all(spark: SparkSession,
          rawDir: String = GarminRaw.defaultRawDir): DataFrame =
    JsonSources.scanEnvelope(spark, s"$rawDir/$exportGlob",
        "summarizedActivitiesExport", innerSchema)
      .select(
        col("activityId"), col("activityType"), col("name"),
        col("sportType"),
        timestamp_millis(col("beginTimestamp")).as("begin_ts"),
        timestamp_millis(col("startTimeLocal").cast("long"))
          .as("start_ts_local"),
        (col("distance") / 100000.0).as("distance_km"),
        (col("duration") / 1000.0).as("duration_s"),
        (col("avgSpeed") * 10.0).as("avg_speed_ms"),
        col("calories"), col("avgHr"), col("maxHr"), col("steps"),
        (col("elevationGain") / 100.0).as("elev_gain_m"),
        col("avgStrideLength"), col("favorite"), col("deviceId"),
        col("locationName"), col("vO2MaxValue"),
        hmsFromMs(col("duration")).as("time_hms"),
        hmsFromMs(col("movingDuration")).as("moving_hms"),
        paceFromCmMs(col("avgSpeed")).as("avg_pace"),
        paceFromCmMs(col("maxSpeed")).as("best_pace"))

  /** P7 — the running_data view: lower(type) contains run. */
  def running(spark: SparkSession,
              rawDir: String = GarminRaw.defaultRawDir): DataFrame =
    all(spark, rawDir)
      .filter(lower(col("activityType")).contains("run"))
}
