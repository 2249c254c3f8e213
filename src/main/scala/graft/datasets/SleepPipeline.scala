package graft.datasets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Impute
import PipelineOps._

/** Sleep dataset pipeline (SURVEY §7.2 — the minimum end-to-end slice).
  *
  * Reference semantics: `ETL Scripts/transform_all_datasets.py:84-148`
  * (transform_sleep_data) + the wrangling notebook's point fix of the
  * all-null record (`PBI ...Wrangling.ipynb:895`: `.loc[109,
  * 'calendarDate'] = 2024-03-14`). Chain: glob scan (S1/S2) →
  * union-by-schema → N1 expand sleepScores → F2 parse timestamps → F14
  * duration → A8 mean-fill → F15 seconds→hours with F1-style renames →
  * P1 drops → golden column order.
  *
  * The notebook's positional `.loc[109]` is recast predicate-targeted
  * (SURVEY §7.4#2): the all-null record in the Q2 export file gets the
  * date its gap corresponds to; remaining undateable rows are dropped.
  */
object SleepPipeline {

  val finalColumns: Seq[String] = Seq(
    "calendarDate", "sleepDurationHours", "sleepDuration",
    "sleepDurationFormatted", "deepSleepHours", "lightSleepHours",
    "remSleepHours", "awakeSleepHours", "unmeasurableHours",
    "averageRespiration", "lowestRespiration", "highestRespiration",
    "awakeCount", "avgSleepStress", "restlessMomentCount", "overallScore",
    "qualityScore", "durationScore", "recoveryScore", "deepScore",
    "remScore", "lightScore", "awakeningsCountScore", "awakeTimeScore",
    "combinedAwakeScore", "restfulnessScore", "interruptionsScore",
    "feedback", "insight")

  def clean(spark: SparkSession,
            rawDir: String = GarminRaw.defaultRawDir,
            impute: Boolean = true): DataFrame = {
    val raw = GarminRaw.sleep(spark, rawDir)

    // Point fix: the Q2 file's all-null record is the 2024-03-14 gap.
    val dated = raw
      .withColumn("calendarDate",
        when(col("calendarDate").isNull &&
             input_file_name().contains("2024-01-23_2024-05-02"),
          lit("2024-03-14")).otherwise(col("calendarDate")))
      .filter(col("calendarDate").isNotNull)
      .withColumn("calendarDate", to_date(col("calendarDate")))

    // N1: expand sleepScores into columns, drop the struct.
    val expanded = dated.select(col("*"), col("sleepScores.*"))
      .drop("sleepScores")

    // F2 parse-or-null timestamps; F14 duration in seconds.
    val withDur = expanded
      .withColumn("sleepDurationSecs",
        (unix_timestamp(try_to_timestamp(col("sleepEndTimestampGMT"))) -
         unix_timestamp(try_to_timestamp(col("sleepStartTimestampGMT"))))
          .cast("double"))
      .drop("sleepStartTimestampGMT", "sleepEndTimestampGMT")
      .withColumn("sleepDurationHours",
        npRound1(col("sleepDurationSecs") / 3600.0))

    // A8: one-pass mean-fill of every double column (imputed cells are
    // flagged for golden comparison by re-running with impute = false).
    val filledNum = if (impute) Impute.meanFill(withDur) else withDur

    val formatted = filledNum
      .withColumn("insight", coalesce(col("insight"), lit("NONE")))
      .withColumn("feedback", coalesce(col("feedback"), lit("NONE")))
      .withColumn("sleepDuration",
        pandasDurationString(col("sleepDurationSecs")))
      .withColumn("sleepDurationFormatted", hmsPadded(col("sleepDurationSecs")))

    // F15: *Seconds stage columns -> hours, renamed Seconds->Hours.
    val secCols = Seq("deepSleepSeconds", "lightSleepSeconds",
      "remSleepSeconds", "awakeSleepSeconds", "unmeasurableSeconds")
    val hours = secCols.foldLeft(formatted) { (d, c) =>
      d.withColumn(c, pyRound1(col(c) / 3600.0))
        .withColumnRenamed(c, c.replace("Seconds", "Hours"))
    }

    hours.select(finalColumns.map(col): _*)
  }
}
