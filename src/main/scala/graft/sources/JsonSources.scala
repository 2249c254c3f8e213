package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON source layer (SURVEY §2.1 S1–S3).
  *
  * Reference semantics:
  *  - S1 glob discovery: `ETL Scripts/aggregate_json_files.py:29-48` finds
  *    date-stamped files under an export root and sorts them. Spark's file
  *    index does the same listing distributed — a glob in the path (plus
  *    `recursiveFileLookup` for nested export trees) replaces the driver-side
  *    loop, and file ordering is irrelevant once rows carry their own keys.
  *  - S2 whole-file JSON arrays: `pd.read_json(path)`
  *    (`aggregate_json_files.py:79`) → `multiLine=true` reads. Schemas are
  *    declared EXPLICITLY: schema inference would force a second pass over
  *    100 TB of input, and inferred types drift per file.
  *  - S3 envelope: `summarizedActivities.json` is
  *    `[{"summarizedActivitiesExport": [...]}]`; the reference hand-iterates
  *    (`extract_json_data.py:25-45`) and keeps a manually "Cleaned" file
  *    workaround. In Spark the wrapper is one row and `explode` (N5) yields
  *    the activity rows — no file surgery.
  *
  * Scale posture: one `spark.read.json` over a glob is a distributed scan
  * (one task per file split); `explode` of a ~354-element array multiplies
  * rows inside the task, no shuffle. Corrupt records are quarantined in
  * `_corrupt_record` rather than failing the scan (PERMISSIVE mode).
  */
object JsonSources {

  /** Activity-export schema for the plain JSON-array fixture files. */
  val activitySchema: StructType = StructType(Seq(
    StructField("activityId", LongType),
    StructField("name", StringType),
    StructField("activityType", StructType(Seq(
      StructField("typeKey", StringType),
      StructField("parentTypeKey", StringType)))),
    StructField("distance", DoubleType),
    StructField("duration", DoubleType),
    StructField("avgSpeed", DoubleType),
    StructField("beginTimestamp", LongType),
    StructField("calories", DoubleType)))

  /** Inner record schema of the summarizedActivities envelope. */
  val summarizedSchema: StructType = StructType(Seq(
    StructField("activityId", LongType),
    StructField("activityName", StringType),
    StructField("activityType", StructType(Seq(
      StructField("typeKey", StringType)))),
    StructField("startTimeGmt", LongType),
    StructField("distance", DoubleType),
    StructField("duration", DoubleType),
    StructField("avgSpeed", DoubleType)))

  val envelopeSchema: StructType = StructType(Seq(
    StructField("summarizedActivitiesExport", ArrayType(summarizedSchema))))

  /** S1+S2 — scan every JSON-array file matching `pathGlob` (a `*.json`
    * glob under the export dir), one row per array element, explicit schema.
    */
  def scanJsonArrays(spark: SparkSession, pathGlob: String,
                     schema: StructType): DataFrame =
    spark.read
      .option("multiLine", "true")
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .json(pathGlob)

  /** S3+N5 — read the enveloped export and explode the wrapper array into
    * one row per activity.
    */
  def scanEnvelope(spark: SparkSession, path: String): DataFrame =
    scanEnvelope(spark, path, "summarizedActivitiesExport", summarizedSchema)

  /** S3+N5 with caller-declared wrapper field + inner schema (the real
    * Garmin export carries ~50 activity fields; callers project by
    * declaring only what they read — the schema IS the projection).
    */
  def scanEnvelope(spark: SparkSession, path: String, wrapperField: String,
                   inner: StructType): DataFrame =
    spark.read
      .option("multiLine", "true")
      .schema(StructType(Seq(StructField(wrapperField, ArrayType(inner)))))
      .json(path)
      .select(explode(col(wrapperField)).as("a"))
      .select(col("a.*"))
}
