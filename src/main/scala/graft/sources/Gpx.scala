package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GPX track-point source (SURVEY §2.1 S9).
  *
  * Reference: `PBI Python Scripts/GPX File Conversion for Run Route Data
  * Mapping.ipynb:26` — parse `.gpx` track→segment→point into
  * `(Date, Time, Latitude, Longitude)` rows, batched over a folder and
  * unioned.
  *
  * Implemented on Spark 4's built-in XML source with `rowTag=trkpt`: each
  * `<trkpt lat=".." lon="..">` element becomes a row (`_lat`/`_lon`
  * attribute columns, `ele`/`time` child columns). A folder glob reads all
  * routes in one distributed scan — the reference's per-file loop + union
  * disappears into the file index.
  */
object Gpx {

  val trkptSchema: StructType = StructType(Seq(
    StructField("_lat", DoubleType),
    StructField("_lon", DoubleType),
    StructField("ele", DoubleType),
    StructField("time", StringType)))

  /** Scan every .gpx under `pathGlob` into
    * (point_date, point_time, latitude, longitude, elevation).
    */
  def scanPoints(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read
      .format("xml")
      .option("rowTag", "trkpt")
      .schema(trkptSchema)
      .load(pathGlob)
      .select(
        to_date(substring(col("time"), 1, 10)).as("point_date"),
        substring(col("time"), 12, 8).as("point_time"),
        col("_lat").as("latitude"),
        col("_lon").as("longitude"),
        col("ele").as("elevation"))
}
