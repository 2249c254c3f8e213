package graft.datasets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.functions.UnitFns
import graft.sources.CsvSources

/** Running dataset surface.
  *
  * The reference's raw Garmin-Connect running CSV is not part of the
  * committed tree (`PBI ...Wrangling.ipynb` cell 1 reads
  * `Running_Data_20241111.csv`, absent), so the notebook-chain (E3)
  * contract applies instead: the cleaned running table is the
  * interchange CSV, and downstream views derive from it —
  * `training_plan` is the flagged+filtered view
  * (`PBI ...Wrangling.ipynb:339-355`: IsTrainingPlan =
  * Date >= 2024-08-13, keep flag == 1), and the master table consumes
  * Date/Distance/Time. Sentinels (`"6,376"` steps, `"3,000"` calories,
  * `--`) survive the scan as strings per S4 and are cleaned only where
  * consumed (F16/F17).
  */
object RunningPipeline {

  val defaultFinalCsv: String = sys.env.getOrElse("GRAFT_RUNNING_CSV",
    "/root/reference/ETL Scripts/PBI Python Scripts/Final Datasets/" +
      "Running_Data_Cleaned_PBI_Final.csv")

  val columns: Seq[String] = Seq("Activity_Type", "Date", "Month_Numeric",
    "Month", "Year", "Week_of_Year", "Title", "Distance", "Distance_Group",
    "DistanceGroupId", "Calories", "Time", "Weekly_Cumulative_Mins",
    "Weekly_Mins_Prior_to_Run", "Monthly_Cumulative_Mins",
    "Monthly_Mins_Prior_to_Run", "Avg_HR", "Max_HR", "Aerobic_TE",
    "Avg_Run_Cadence", "Max_Run_Cadence", "Avg_Pace", "Best_Pace",
    "Total_Ascent", "Total_Descent", "Avg_Stride_Length",
    "Avg_Vertical_Ratio", "Avg_Vertical_Oscillation",
    "Avg_Ground_Contact_Time", "Normalized_Power_NP", "Avg_Power",
    "Max_Power", "Steps", "Moving_Time", "Elapsed_Time", "Min_Elevation",
    "Max_Elevation", "Idle_Time")

  /** All-string schema: the PBI CSV mixes sentinels and formatted times
    * into numeric-looking columns; values are typed at the use site.
    */
  val schema: StructType = StructType(columns.map(StructField(_, StringType)))

  def loadFinal(spark: SparkSession,
                csvPath: String = defaultFinalCsv): DataFrame =
    CsvSources.scan(spark, csvPath, schema)

  /** P8 + F20: flag runs on/after the plan start, keep only those. */
  def trainingPlan(spark: SparkSession,
                   csvPath: String = defaultFinalCsv,
                   planStart: String = "2024-08-13"): DataFrame =
    loadFinal(spark, csvPath)
      .withColumn("IsTrainingPlan",
        UnitFns.flag(to_date(col("Date")) >= lit(planStart)))
      .filter(col("IsTrainingPlan") === 1)

  /** Typed projection for the master join: calendarDate, Distance (miles,
    * double), RunTime (the formatted duration string), cleaned Calories.
    * A11: two-run days keep the longest run so the daily master join
    * stays 1:1 (`ML_Model_...ipynb:2515` semantics).
    */
  def forMaster(spark: SparkSession,
                csvPath: String = defaultFinalCsv): DataFrame = {
    val typed = loadFinal(spark, csvPath).select(
      to_date(col("Date")).as("calendarDate"),
      col("Distance").cast("double").as("Distance"),
      col("Time").as("RunTime"),
      UnitFns.sentinelToDefault(col("Calories")).as("Calories"))
    graft.operators.Dedup.keepLatest(typed, Seq("calendarDate"),
      col("Distance"), Seq(col("RunTime")))
  }
}
