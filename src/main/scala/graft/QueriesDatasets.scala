package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.datasets._

/** Oracle-checked entries for the Garmin dataset pipelines. These read
  * the reference's committed raw export (not the sfDir testdata — the
  * sfDir parameter is ignored), and the DuckDB oracles replay the same
  * transform over the same raw JSON via read_json, so the driver's
  * hash compare covers the whole pipeline: scan → union → clean → dedup
  * → scaffold/ffill → impute → project.
  *
  * Floating-point discipline for the imputing pipelines (sleep/uds):
  * every mean-fill here sums INTEGER-VALUED doubles (verified over the
  * committed export), so the sum is exact and the mean is identical
  * under any summation order — Spark's partial aggregation and DuckDB's
  * sequential scan produce the same bits. The two columns where that
  * does not hold (sleepDurationHours: means of one-decimal doubles;
  * avgSleepStress: float32-derived values) are routed through
  * [[stab6]], a 6-decimal half-even stabilizer that collapses last-ulp
  * summation noise while preserving the golden-pinned value to 1e-6.
  * The remaining rounded columns (pyRound1 of secs/3600) sit ≥0.02 from
  * every 1-decimal rounding boundary on this data, so the DuckDB
  * `round_even((x)*10)/10` mirror is exact (no binary value of
  * secs/3600 can land ON a tie: k.05 has no finite binary expansion).
  */
object QueriesDatasets {

  private val raw =
    "/root/reference/ETL Scripts/PBI Python Scripts/Raw Data"
  private def glob(sub: String) = s"$raw/*/DI_CONNECT/$sub"

  /** Kill last-ulp fp noise: 6-decimal half-even (functions.Stabilize). */
  private def stab6(c: Column): Column =
    graft.functions.Stabilize.stab(c, 6)
  private def stab6Sql(e: String): String =
    graft.functions.Stabilize.stabSql(e, 6)

  /** DuckDB mirror of PipelineOps.npRound1 applied to x/3600. npRound1
    * multiplies by 10 in fp FIRST (both engines hit the same product
    * double, ties included), so the product-space round_even is exact.
    */
  private def npRound1Sql(e: String): String =
    s"round_even(($e / 3600.0) * 10.0, 0) / 10.0"

  /** DuckDB mirror of PipelineOps.pyRound1 (CPython round-half-even on
    * the EXACT binary value) applied to x/3600. `printf('%.1f', x)`
    * correctly rounds the exact expansion — CPython's semantics — and a
    * true decimal tie is impossible (k.05 has no finite binary
    * expansion), so printf's tie rule never fires. The product-space
    * round_even mirror is WRONG here: for secs divisible by 180,
    * secs/3600 sits just off k.05 but its ×10 product lands exactly on
    * k.5, flipping the result (e.g. 180 s → 0.05 → py 0.1, product 0.0).
    */
  private def pyRound1Sql(e: String): String =
    s"CAST(printf('%.1f', $e / 3600.0) AS DOUBLE)"

  // ---- sleep oracle ------------------------------------------------------
  private val sleepScores = Seq("overallScore", "qualityScore",
    "durationScore", "recoveryScore", "deepScore", "remScore", "lightScore",
    "awakeningsCountScore", "awakeTimeScore", "combinedAwakeScore",
    "restfulnessScore", "interruptionsScore")
  private val sleepStages = Seq("deepSleepSeconds", "lightSleepSeconds",
    "remSleepSeconds", "awakeSleepSeconds", "unmeasurableSeconds")
  private val sleepOthers = Seq("averageRespiration", "lowestRespiration",
    "highestRespiration", "awakeCount", "avgSleepStress",
    "restlessMomentCount")
  private val sleepDbl =
    sleepStages ++ sleepOthers ++ sleepScores ++
      Seq("sleepDurationSecs", "sleepDurationHours")

  private val sleepOracle: String = {
    val sstruct = "STRUCT(" +
      sleepScores.map(s => s"$s DOUBLE").mkString(", ") +
      ", feedback VARCHAR, insight VARCHAR)"
    val cols = "{calendarDate:'VARCHAR', sleepStartTimestampGMT:'VARCHAR'," +
      " sleepEndTimestampGMT:'VARCHAR', " +
      (sleepStages ++ sleepOthers).map(c => s"$c:'DOUBLE'").mkString(", ") +
      s", sleepScores:'$sstruct'}"
    val secsLong = "CAST(trunc(sleepDurationSecs) AS BIGINT)"
    s"""WITH src AS (
       |  SELECT * FROM read_json(
       |    '${glob("DI-Connect-Wellness/*sleepData.json")}',
       |    format='array', filename=true, columns=$cols)),
       |dated AS (
       |  SELECT CAST(CASE WHEN calendarDate IS NULL
       |        AND filename LIKE '%2024-01-23_2024-05-02%'
       |      THEN '2024-03-14' ELSE calendarDate END AS DATE) AS calendarDate,
       |    * EXCLUDE (calendarDate, filename)
       |  FROM src
       |  WHERE calendarDate IS NOT NULL
       |     OR filename LIKE '%2024-01-23_2024-05-02%'),
       |expanded AS (
       |  SELECT dated.* EXCLUDE (sleepScores, sleepStartTimestampGMT,
       |      sleepEndTimestampGMT),
       |    ${sleepScores.map(s => s"sleepScores.$s AS $s").mkString(", ")},
       |    sleepScores.feedback AS feedback, sleepScores.insight AS insight,
       |    CAST(epoch(TRY_CAST(sleepEndTimestampGMT AS TIMESTAMP)) -
       |         epoch(TRY_CAST(sleepStartTimestampGMT AS TIMESTAMP))
       |      AS DOUBLE) AS sleepDurationSecs
       |  FROM dated),
       |hrs0 AS (
       |  SELECT *, ${npRound1Sql("sleepDurationSecs")} AS sleepDurationHours
       |  FROM expanded),
       |filled AS (
       |  SELECT calendarDate, feedback, insight,
       |    ${sleepDbl.map(c => s"COALESCE($c, AVG($c) OVER ()) AS $c")
             .mkString(",\n       |    ")}
       |  FROM hrs0)
       |SELECT calendarDate,
       |  ${stab6Sql("sleepDurationHours")} AS sleepDurationHours,
       |  printf('%d days %02d:%02d:%02d', $secsLong // 86400,
       |    ($secsLong % 86400) // 3600, ($secsLong % 3600) // 60,
       |    $secsLong % 60) AS sleepDuration,
       |  printf('%02d:%02d:%02d', ($secsLong % 86400) // 3600,
       |    ($secsLong % 3600) // 60, $secsLong % 60)
       |    AS sleepDurationFormatted,
       |  ${sleepStages.map(c =>
             s"${pyRound1Sql(c)} AS ${c.replace("Seconds", "Hours")}")
             .mkString(",\n       |  ")},
       |  averageRespiration, lowestRespiration, highestRespiration,
       |  awakeCount, ${stab6Sql("avgSleepStress")} AS avgSleepStress,
       |  restlessMomentCount,
       |  ${sleepScores.mkString(", ")},
       |  COALESCE(feedback, 'NONE') AS feedback,
       |  COALESCE(insight, 'NONE') AS insight
       |FROM filled ORDER BY calendarDate""".stripMargin
  }

  // ---- uds oracle --------------------------------------------------------
  private val udsDirect = Seq("totalKilocalories", "activeKilocalories",
    "bmrKilocalories", "totalSteps", "totalDistanceMeters",
    "highlyActiveSeconds", "activeSeconds", "moderateIntensityMinutes",
    "vigorousIntensityMinutes", "minHeartRate", "maxHeartRate",
    "restingHeartRate", "currentDayRestingHeartRate")
  private val udsTotal = Seq("averageStressLevel",
    "averageStressLevelIntensity", "maxStressLevel", "stressIntensityCount",
    "stressOffWristCount", "totalStressCount", "totalStressIntensity",
    "stressDuration", "stressTooActiveCount", "restDuration",
    "activityDuration", "mediumDuration", "highDuration")

  private val udsOracle: String = {
    val aggstruct = "STRUCT(type VARCHAR, " +
      udsTotal.map(f => s"$f DOUBLE").mkString(", ") + ")[]"
    val cols = "{calendarDate:'VARCHAR', " +
      udsDirect.map(c => s"$c:'DOUBLE'").mkString(", ") +
      s", isVigorousDay:'BOOLEAN', allDayStress:'STRUCT(aggregatorList $aggstruct)'}"
    val longCols = udsDirect ++ Seq("isVigorousDay") ++ udsTotal
    s"""WITH src AS (
       |  SELECT * FROM read_json(
       |    '${glob("DI-Connect-Aggregator/UDSFile_*.json")}',
       |    format='array', columns=$cols)),
       |tot AS (
       |  SELECT CAST(calendarDate AS DATE) AS calendarDate,
       |    ${udsDirect.mkString(", ")},
       |    COALESCE(CAST(CAST(isVigorousDay AS INT) AS DOUBLE), 0.0)
       |      AS isVigorousDay,
       |    list_filter(allDayStress.aggregatorList,
       |      x -> x.type = 'TOTAL')[1] AS t
       |  FROM src),
       |ex AS (
       |  SELECT * EXCLUDE (t),
       |    ${udsTotal.map(f => s"t.$f AS $f").mkString(", ")}
       |  FROM tot),
       |filled AS (
       |  SELECT calendarDate,
       |    ${longCols.map(c => s"COALESCE($c, AVG($c) OVER ()) AS $c")
             .mkString(",\n       |    ")}
       |  FROM ex),
       |ints AS (
       |  SELECT calendarDate,
       |    ${longCols.map(c => s"CAST(trunc($c) AS BIGINT) AS $c")
             .mkString(",\n       |    ")}
       |  FROM filled)
       |SELECT calendarDate,
       |  CAST(date_part('year', calendarDate) AS INT) AS Year,
       |  CAST(date_part('month', calendarDate) AS INT) AS Month,
       |  monthname(calendarDate) AS MonthName,
       |  CAST(date_part('quarter', calendarDate) AS INT) AS Quarter,
       |  CAST(date_part('day', calendarDate) AS INT) AS Day,
       |  ${udsDirect.mkString(", ")}, isVigorousDay,
       |  ${udsTotal.mkString(", ")}
       |FROM ints ORDER BY calendarDate""".stripMargin
  }

  // ---- master oracle (composed from the per-dataset replays) -------------
  /** Stable master projection: the columns sourced from the four
    * non-imputing pipelines + the running CSV. Sleep/uds columns are
    * covered by their own oracle entries; excluding them here keeps the
    * master hash free of cross-engine mean-fill noise while still
    * exercising J1 (7-way full outer), the status filter, the ffill, and
    * the run-day flags — the row set is identical because days only
    * present in sleep/uds carry no trainingStatus and are filtered.
    */
  private val masterCols = Seq("calendarDate", "acwrStatus",
    "dailyTrainingLoadAcute", "dailyTrainingLoadChronic", "acwrPercent",
    "dailyAcuteChronicWorkloadRatio", "vo2MaxValue", "maxMet",
    "raceTime5K", "raceTime10K", "raceTimeHalf", "raceTimeMarathon",
    "Distance", "RunTime", "IsRunDay", "trainingStatus",
    "fitnessLevelTrend")

  /** The imputing-pipeline columns the master build also carries
    * (sleep 8 + uds 7). Kept out of [[masterCols]] (fp-noise story in
    * that scaladoc); hash-pinned by q_ds_master_table_full, which
    * stabilizes the two noisy sleep columns the same way q_ds_sleep
    * does and reuses [[sleepOracle]]/[[udsOracle]] verbatim as oracle
    * subqueries so the two entries cannot drift.
    */
  private val masterSleepCols = Seq("sleepDurationHours", "deepSleepHours",
    "lightSleepHours", "remSleepHours", "awakeSleepHours",
    "averageRespiration", "avgSleepStress", "overallScore")
  private val masterUdsCols = Seq("totalSteps", "totalKilocalories",
    "activeKilocalories", "restingHeartRate", "averageStressLevel",
    "highDuration", "mediumDuration")

  /** Master oracle, parameterized by whether the imputing-pipeline
    * columns ride along (`full = true` → q_ds_master_table_full).
    * Shared text: the five non-imputing input CTEs, the N-way FULL
    * JOIN, the status filter + post-join ffill. The full variant adds
    * sleepx/udsx CTEs that subquery the per-dataset oracles (already
    * stabilized there) and widens the join + final projection.
    */
  private def masterOracleSql(full: Boolean): String = {
    val ffill = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    val imputedCtes = if (!full) "" else
      s"""sleepx AS (
       |  SELECT calendarDate, ${masterSleepCols.mkString(", ")}
       |  FROM ($sleepOracle)),
       |udsx AS (
       |  SELECT calendarDate, ${masterUdsCols.mkString(", ")}
       |  FROM ($udsOracle)),""".stripMargin
    val imputedJoins = if (!full) "" else
      s"""
       |  FULL JOIN sleepx USING (calendarDate)
       |  FULL JOIN udsx USING (calendarDate)""".stripMargin
    val imputedSelect = if (!full) "" else
      s""",
       |  ${masterSleepCols.mkString(", ")},
       |  ${masterUdsCols.mkString(", ")}""".stripMargin
    s"""WITH atl AS (
       |  SELECT calendarDate, acwrStatus, dailyTrainingLoadAcute,
       |    dailyTrainingLoadChronic, acwrPercent,
       |    dailyAcuteChronicWorkloadRatio
       |  FROM (SELECT *, row_number() OVER (
       |      PARTITION BY calendarDate ORDER BY ts DESC) AS rn
       |    FROM (SELECT CAST(epoch_ms("timestamp") AS DATE) AS calendarDate,
       |        acwrStatus,
       |        CAST(dailyTrainingLoadAcute AS DOUBLE)
       |          AS dailyTrainingLoadAcute,
       |        CAST(dailyTrainingLoadChronic AS DOUBLE)
       |          AS dailyTrainingLoadChronic,
       |        CAST(acwrPercent AS DOUBLE) AS acwrPercent,
       |        CAST(dailyAcuteChronicWorkloadRatio AS DOUBLE)
       |          AS dailyAcuteChronicWorkloadRatio,
       |        "timestamp" AS ts
       |      FROM read_json_auto(
       |        '${glob("DI-Connect-Metrics/MetricsAcuteTrainingLoad_*.json")}',
       |        union_by_name=true)
       |      WHERE acwrStatus <> 'NONE'
       |        AND dailyAcuteChronicWorkloadRatio IS NOT NULL))
       |  WHERE rn = 1),
       |maxmet AS (
       |  WITH dedup AS (
       |    SELECT * FROM (
       |      SELECT CAST(calendarDate AS DATE) AS calendarDate,
       |        vo2MaxValue, maxMet,
       |        row_number() OVER (PARTITION BY CAST(calendarDate AS DATE)
       |          ORDER BY updateTimestamp DESC) AS rn
       |      FROM read_json_auto(
       |        '${glob("DI-Connect-Metrics/MetricsMaxMetData_*.json")}',
       |        union_by_name=true)) WHERE rn = 1),
       |  spine AS (
       |    SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))
       |      AS DATE) AS calendarDate
       |    FROM (SELECT min(calendarDate) AS lo, max(calendarDate) AS hi
       |          FROM dedup))
       |  SELECT s.calendarDate,
       |    last_value(vo2MaxValue IGNORE NULLS) OVER (
       |      ORDER BY s.calendarDate $ffill) AS vo2MaxValue,
       |    last_value(maxMet IGNORE NULLS) OVER (
       |      ORDER BY s.calendarDate $ffill) AS maxMet
       |  FROM spine s LEFT JOIN dedup USING (calendarDate)),
       |race AS (
       |  SELECT CAST(calendarDate AS DATE) AS calendarDate,
       |    min(raceTime5K) AS raceTime5K, min(raceTime10K) AS raceTime10K,
       |    min(raceTimeHalf) AS raceTimeHalf,
       |    min(raceTimeMarathon) AS raceTimeMarathon
       |  FROM read_json_auto(
       |    '${glob("DI-Connect-Metrics/RunRacePredictions_*.json")}',
       |    union_by_name=true)
       |  GROUP BY 1),
       |run AS (
       |  SELECT calendarDate, Distance, RunTime FROM (
       |    SELECT CAST("Date" AS DATE) AS calendarDate,
       |      CAST(Distance AS DOUBLE) AS Distance, "Time" AS RunTime,
       |      row_number() OVER (PARTITION BY CAST("Date" AS DATE)
       |        ORDER BY CAST(Distance AS DOUBLE) DESC, "Time") AS rn
       |    FROM read_csv('${RunningPipeline.defaultFinalCsv}',
       |      header=true, all_varchar=true)) WHERE rn = 1),
       |th AS (
       |  SELECT calendarDate, trainingStatus, fitnessLevelTrend FROM (
       |    SELECT CAST(calendarDate AS DATE) AS calendarDate,
       |      trainingStatus, fitnessLevelTrend,
       |      row_number() OVER (PARTITION BY CAST(calendarDate AS DATE)
       |        ORDER BY "timestamp" DESC) AS rn
       |    FROM read_json_auto(
       |      '${glob("DI-Connect-Metrics/TrainingHistory_*.json")}',
       |      union_by_name=true))
       |  WHERE rn = 1 AND trainingStatus <> 'NO_STATUS'),
$imputedCtes
       |j AS (
       |  SELECT * FROM atl
       |  FULL JOIN maxmet USING (calendarDate)
       |  FULL JOIN race USING (calendarDate)
       |  FULL JOIN run USING (calendarDate)
       |  FULL JOIN th USING (calendarDate)$imputedJoins),
       |w AS (
       |  SELECT *,
       |    last_value(vo2MaxValue IGNORE NULLS) OVER (
       |      ORDER BY calendarDate $ffill) AS vo2f,
       |    last_value(maxMet IGNORE NULLS) OVER (
       |      ORDER BY calendarDate $ffill) AS mmf
       |  FROM j WHERE trainingStatus IS NOT NULL)
       |SELECT calendarDate, acwrStatus, dailyTrainingLoadAcute,
       |  dailyTrainingLoadChronic, acwrPercent,
       |  dailyAcuteChronicWorkloadRatio,
       |  vo2f AS vo2MaxValue, mmf AS maxMet,
       |  raceTime5K, raceTime10K, raceTimeHalf, raceTimeMarathon,
       |  COALESCE(Distance, 0.0) AS Distance,
       |  COALESCE(RunTime, '00:00:00') AS RunTime,
       |  CASE WHEN COALESCE(Distance, 0.0) > 0.0 THEN 1 ELSE 0 END
       |    AS IsRunDay,
       |  trainingStatus, fitnessLevelTrend$imputedSelect
       |FROM w ORDER BY calendarDate""".stripMargin
  }

  private val masterOracle: String = masterOracleSql(full = false)
  private val masterFullOracle: String = masterOracleSql(full = true)

  // ---- activities oracle (summarized_activities / running_data) --------
  private val activitiesOracle: String = {
    val struct = "STRUCT(activityId BIGINT, activityType VARCHAR, " +
      "name VARCHAR, sportType VARCHAR, beginTimestamp BIGINT, " +
      "startTimeLocal DOUBLE, distance DOUBLE, duration DOUBLE, " +
      "movingDuration DOUBLE, avgSpeed DOUBLE, maxSpeed DOUBLE, " +
      "calories DOUBLE, avgHr DOUBLE, maxHr DOUBLE, steps DOUBLE, " +
      "elevationGain DOUBLE, avgStrideLength DOUBLE, favorite BOOLEAN, " +
      "deviceId BIGINT, locationName VARCHAR, vO2MaxValue DOUBLE)"
    // int()-truncation formatting (CAST in DuckDB ROUNDS — trunc first)
    def hms(ms: String) = {
      val s = s"CAST(trunc($ms / 1000.0) AS BIGINT)"
      s"CASE WHEN $ms IS NULL OR $ms = 0 THEN '0:00:00' ELSE " +
        s"printf('%d:%02d:%02d', $s // 3600, ($s % 3600) // 60, $s % 60) END"
    }
    def pace(v: String) = {
      val spk = s"CAST(trunc(1000.0 / ($v * 10.0)) AS BIGINT)"
      s"CASE WHEN $v IS NULL OR $v <= 0 THEN '0:00' ELSE " +
        s"printf('%d:%02d', $spk // 60, $spk % 60) END"
    }
    s"""WITH src AS (
       |  SELECT unnest(summarizedActivitiesExport) AS a
       |  FROM read_json(
       |    '${glob("DI-Connect-Fitness/*summarizedActivities*.json")}',
       |    format='array',
       |    columns={summarizedActivitiesExport: '$struct[]'}))
       |SELECT a.activityId AS activityId, a.activityType AS activityType,
       |  a.name AS name, a.sportType AS sportType,
       |  epoch_ms(a.beginTimestamp) AS begin_ts,
       |  epoch_ms(CAST(trunc(a.startTimeLocal) AS BIGINT))
       |    AS start_ts_local,
       |  a.distance / 100000.0 AS distance_km,
       |  a.duration / 1000.0 AS duration_s,
       |  a.avgSpeed * 10.0 AS avg_speed_ms,
       |  a.calories AS calories, a.avgHr AS avgHr, a.maxHr AS maxHr,
       |  a.steps AS steps,
       |  a.elevationGain / 100.0 AS elev_gain_m,
       |  a.avgStrideLength AS avgStrideLength, a.favorite AS favorite,
       |  a.deviceId AS deviceId, a.locationName AS locationName,
       |  a.vO2MaxValue AS vO2MaxValue,
       |  ${hms("a.duration")} AS time_hms,
       |  ${hms("a.movingDuration")} AS moving_hms,
       |  ${pace("a.avgSpeed")} AS avg_pace,
       |  ${pace("a.maxSpeed")} AS best_pace
       |FROM src""".stripMargin
  }

  val qs: Seq[Q] = Seq(

    Q("q_ds_activities",
      (s, _) => ActivitiesPipeline.all(s)
        .orderBy(org.apache.spark.sql.functions.col("activityId")),
      Some(s"""WITH acts AS ($activitiesOracle)
              |SELECT * FROM acts ORDER BY activityId""".stripMargin)),

    Q("q_ds_running_extract",
      (s, _) => ActivitiesPipeline.running(s)
        .orderBy(org.apache.spark.sql.functions.col("activityId")),
      Some(s"""WITH acts AS ($activitiesOracle)
              |SELECT * FROM acts
              |WHERE lower(activityType) LIKE '%run%'
              |ORDER BY activityId""".stripMargin)),

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
        .orderBy(col("calendarDate")),
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
        .orderBy(col("calendarDate")),
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

    // Full-pipeline replays with fp-stabilized projections (see scaladoc).
    Q("q_ds_sleep",
      (s, _) => SleepPipeline.clean(s)
        .withColumn("sleepDurationHours", stab6(col("sleepDurationHours")))
        .withColumn("avgSleepStress", stab6(col("avgSleepStress")))
        .orderBy(col("calendarDate")),
      Some(sleepOracle)),

    Q("q_ds_uds",
      (s, _) => UdsPipeline.clean(s).orderBy(col("calendarDate")),
      Some(udsOracle)),

    Q("q_ds_training_plan",
      (s, _) => RunningPipeline.trainingPlan(s)
        .orderBy(col("Date"), col("Title")),
      Some(s"""SELECT *, 1 AS IsTrainingPlan
              |FROM read_csv('${RunningPipeline.defaultFinalCsv}',
              |  header=true, all_varchar=true)
              |WHERE CAST("Date" AS DATE) >= DATE '2024-08-13'
              |ORDER BY "Date", Title""".stripMargin)),

    Q("q_ds_master_table",
      (s, _) => MasterTable.build(s)
        .select(masterCols.map(col): _*)
        .orderBy(col("calendarDate")),
      Some(masterOracle)),

    // The FULL master projection: the stable columns above PLUS the 15
    // sleep/uds imputing-pipeline columns that masterCols excludes. The
    // two fp-noisy sleep columns go through the same stab6 the sleep
    // replay uses; the oracle reuses sleepOracle/udsOracle verbatim as
    // subqueries, so the 7-way full-outer join (`ML …Merge.ipynb:1883`)
    // now has hash evidence over its complete column set, not just the
    // non-imputing projection.
    Q("q_ds_master_table_full",
      (s, _) => MasterTable.build(s)
        .select((masterCols ++ masterSleepCols ++ masterUdsCols).map(col): _*)
        .withColumn("sleepDurationHours", stab6(col("sleepDurationHours")))
        .withColumn("avgSleepStress", stab6(col("avgSleepStress")))
        .orderBy(col("calendarDate")),
      Some(masterFullOracle))
  )
}
