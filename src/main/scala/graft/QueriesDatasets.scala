package graft

import graft.datasets._

/** Oracle-checked entries for the Garmin dataset pipelines. These read
  * the reference's committed raw export (not the sfDir testdata — the
  * sfDir parameter is ignored), and the DuckDB oracles replay the same
  * transform over the same raw JSON via read_json_auto, so the driver's
  * hash compare covers the whole pipeline: scan → union → clean → dedup
  * → scaffold/ffill → project.
  *
  * sleep_data and uds_data are registered rows-only: their mean-fill
  * (binary-exact CPython rounding, truncation casts over ~30 columns)
  * is pinned cell-for-cell by the golden-file suite
  * (graft.datasets.GoldenSpec) instead of duplicated in SQL.
  */
object QueriesDatasets {

  private val raw =
    "/root/reference/ETL Scripts/PBI Python Scripts/Raw Data"
  private def glob(sub: String) = s"$raw/*/DI_CONNECT/$sub"

  val qs: Seq[Q] = Seq(

    Q("q_ds_atl",
      (s, _) => MetricsPipelines.atl(s),
      Some(s"""WITH f AS (
              |  SELECT CAST(epoch_ms("timestamp") AS DATE) AS calendarDate,
              |    acwrStatus,
              |    CAST(dailyTrainingLoadAcute AS DOUBLE) AS dailyTrainingLoadAcute,
              |    CAST(dailyTrainingLoadChronic AS DOUBLE) AS dailyTrainingLoadChronic,
              |    CAST(acwrPercent AS DOUBLE) AS acwrPercent,
              |    CAST(dailyAcuteChronicWorkloadRatio AS DOUBLE)
              |      AS dailyAcuteChronicWorkloadRatio,
              |    "timestamp" AS ts
              |  FROM read_json_auto(
              |    '${glob("DI-Connect-Metrics/MetricsAcuteTrainingLoad_*.json")}',
              |    union_by_name=true)
              |  WHERE acwrStatus <> 'NONE'
              |    AND dailyAcuteChronicWorkloadRatio IS NOT NULL),
              |r AS (SELECT *, row_number() OVER (
              |        PARTITION BY calendarDate ORDER BY ts DESC) AS rn
              |      FROM f)
              |SELECT calendarDate, acwrStatus, dailyTrainingLoadAcute,
              |       dailyTrainingLoadChronic, acwrPercent,
              |       dailyAcuteChronicWorkloadRatio
              |FROM r WHERE rn = 1 ORDER BY calendarDate""".stripMargin)),

    Q("q_ds_race_predictions",
      (s, _) => MetricsPipelines.racePredictions(s),
      Some(s"""WITH mins AS (
              |  SELECT CAST(calendarDate AS DATE) AS calendarDate,
              |    min(raceTime5K) AS raceTime5K,
              |    min(raceTime10K) AS raceTime10K,
              |    min(raceTimeHalf) AS raceTimeHalf,
              |    min(raceTimeMarathon) AS raceTimeMarathon
              |  FROM read_json_auto(
              |    '${glob("DI-Connect-Metrics/RunRacePredictions_*.json")}',
              |    union_by_name=true)
              |  GROUP BY 1)
              |SELECT calendarDate,
              |  CAST(date_part('year', calendarDate) AS INT) AS Year,
              |  CAST(date_part('month', calendarDate) AS INT) AS Month,
              |  monthname(calendarDate) AS MonthName,
              |  CAST(date_part('quarter', calendarDate) AS INT) AS Quarter,
              |  CAST(date_part('day', calendarDate) AS INT) AS Day,
              |  raceTime5K, raceTime10K, raceTimeHalf, raceTimeMarathon,
              |  printf('%02d:%02d:%02d', raceTime5K // 3600,
              |    (raceTime5K % 3600) // 60, raceTime5K % 60)
              |    AS raceTime5K_timedelta,
              |  printf('%02d:%02d:%02d', raceTime10K // 3600,
              |    (raceTime10K % 3600) // 60, raceTime10K % 60)
              |    AS raceTime10K_timedelta,
              |  printf('%02d:%02d:%02d', raceTimeHalf // 3600,
              |    (raceTimeHalf % 3600) // 60, raceTimeHalf % 60)
              |    AS raceTimeHalf_timedelta,
              |  printf('%02d:%02d:%02d', raceTimeMarathon // 3600,
              |    (raceTimeMarathon % 3600) // 60, raceTimeMarathon % 60)
              |    AS raceTimeMarathon_timedelta
              |FROM mins ORDER BY calendarDate""".stripMargin)),

    Q("q_ds_training_history",
      (s, _) => MetricsPipelines.trainingHistory(s)
        .orderBy(org.apache.spark.sql.functions.col("calendarDate")),
      Some(s"""WITH r AS (
              |  SELECT CAST(calendarDate AS DATE) AS calendarDate,
              |    trainingStatus, fitnessLevelTrend,
              |    row_number() OVER (
              |      PARTITION BY CAST(calendarDate AS DATE)
              |      ORDER BY "timestamp" DESC) AS rn
              |  FROM read_json_auto(
              |    '${glob("DI-Connect-Metrics/TrainingHistory_*.json")}',
              |    union_by_name=true))
              |SELECT calendarDate, trainingStatus, fitnessLevelTrend
              |FROM r WHERE rn = 1 AND trainingStatus <> 'NO_STATUS'
              |ORDER BY calendarDate""".stripMargin)),

    Q("q_ds_maxmet",
      (s, _) => MetricsPipelines.maxmet(s)
        .orderBy(org.apache.spark.sql.functions.col("calendarDate")),
      Some(s"""WITH dedup AS (
              |  SELECT * FROM (
              |    SELECT CAST(calendarDate AS DATE) AS calendarDate,
              |      vo2MaxValue, maxMet,
              |      row_number() OVER (
              |        PARTITION BY CAST(calendarDate AS DATE)
              |        ORDER BY updateTimestamp DESC) AS rn
              |    FROM read_json_auto(
              |      '${glob("DI-Connect-Metrics/MetricsMaxMetData_*.json")}',
              |      union_by_name=true)) WHERE rn = 1),
              |spine AS (
              |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))
              |    AS DATE) AS calendarDate
              |  FROM (SELECT min(calendarDate) AS lo, max(calendarDate) AS hi
              |        FROM dedup))
              |SELECT s.calendarDate,
              |  last_value(vo2MaxValue IGNORE NULLS) OVER (
              |    ORDER BY s.calendarDate
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |    AS vo2MaxValue,
              |  last_value(maxMet IGNORE NULLS) OVER (
              |    ORDER BY s.calendarDate
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS maxMet
              |FROM spine s LEFT JOIN dedup USING (calendarDate)
              |ORDER BY s.calendarDate""".stripMargin)),

    // Golden-tested pipelines, rows-only here (see scaladoc above).
    Q("q_ds_sleep", (s, _) => SleepPipeline.clean(s), None),
    Q("q_ds_uds", (s, _) => UdsPipeline.clean(s), None),
    Q("q_ds_training_plan", (s, _) => RunningPipeline.trainingPlan(s), None),
    Q("q_ds_master_table", (s, _) => MasterTable.build(s), None)
  )
}
