package graft.datasets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Golden-file parity against the reference's committed
  * Final Datasets CSVs.
  *
  * The committed raw export is a SUBSET of the corpus that produced the
  * goldens (raw sleep ends 2024-08-08; golden runs to 2024-12-17), so the
  * contract is: every row we produce must match the golden row for the
  * same calendarDate, except cells that were null in raw and mean-imputed
  * — those were filled from the reference's larger corpus and are only
  * checked for non-nullness. The imputed-cell mask comes from re-running
  * the pipeline with imputation disabled.
  */
class GoldenSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val goldenDir =
    "/root/reference/ETL Scripts/PBI Python Scripts/Final Datasets"

  private def readGolden(name: String,
                         key: String): Map[String, Map[String, String]] = {
    val src = scala.io.Source.fromFile(s"$goldenDir/$name")
    try {
      // The goldens are simple CSVs; only Steps/Calories-style fields are
      // quoted (thousands commas), handled by a quote-aware splitter.
      def split(line: String): Seq[String] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        val sb = new StringBuilder; var q = false
        line.foreach {
          case '"' => q = !q
          case ',' if !q => out += sb.result(); sb.clear()
          case c => sb += c
        }
        out += sb.result(); out.toSeq
      }
      val lines = src.getLines().toList
      val header = split(lines.head)
      lines.tail.map { l =>
        val vals = split(l)
        val m = header.zip(vals).toMap
        m(key) -> m
      }.toMap
    } finally src.close()
  }

  private def numEq(a: String, b: String): Boolean =
    (a.toDoubleOption, b.toDoubleOption) match {
      case (Some(x), Some(y)) =>
        math.abs(x - y) <= 1e-6 * math.max(1.0, math.max(x.abs, y.abs))
      case _ => a == b
    }

  /** Compare `mine` (keyed by `key`) to the golden file; cells null in
    * `mask` (the no-impute run) are only checked non-null. Returns the
    * number of compared rows.
    */
  private def assertGolden(mine: DataFrame, mask: Option[DataFrame],
                           goldenFile: String, key: String,
                           minOverlap: Int,
                           excludeKeys: Set[String] = Set.empty): Int = {
    val golden = readGolden(goldenFile, key) -- excludeKeys
    def keyed(df: DataFrame): Map[String, Map[String, String]] =
      df.collect().map { r =>
        val m = df.columns.zipWithIndex.map { case (c, i) =>
          c -> (if (r.isNullAt(i)) null else r.get(i).toString)
        }.toMap
        m(key) -> m
      }.toMap
    val mineK = keyed(mine)
    val maskK = mask.map(keyed)
    var compared = 0
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    mineK.foreach { case (k, row) =>
      golden.get(k).foreach { grow =>
        compared += 1
        row.foreach { case (c, v) =>
          if (grow.contains(c)) {
            val imputed = maskK.exists(_.get(k).exists(_(c) == null))
            if (imputed) {
              if (v == null) errs += s"$k/$c: imputed cell still null"
            } else if (v == null) {
              errs += s"$k/$c: null but golden has '${grow(c)}'"
            } else if (!numEq(v, grow(c))) {
              errs += s"$k/$c: '$v' != golden '${grow(c)}'"
            }
          }
        }
      }
    }
    assert(errs.isEmpty, s"${errs.size} golden mismatches, first 10:\n" +
      errs.take(10).mkString("\n"))
    assert(compared >= minOverlap,
      s"only $compared overlapping rows (expected >= $minOverlap)")
    compared
  }

  test("sleep pipeline matches Sleep_Cleaned_PBI_Final on the raw overlap") {
    val mine = SleepPipeline.clean(spark)
    val mask = SleepPipeline.clean(spark, impute = false)
    assert(mine.columns.toSeq == SleepPipeline.finalColumns)
    assert(mine.count() == 257)
    assertGolden(mine, Some(mask), "Sleep_Cleaned_PBI_Final.csv",
      "calendarDate", minOverlap = 250)
  }

  test("atl pipeline matches ATL_Cleaned_PBI_Final exactly on overlap") {
    val mine = MetricsPipelines.atl(spark)
    assertGolden(mine, None, "ATL_Cleaned_PBI_Final.csv",
      "calendarDate", minOverlap = 200)
  }

  test("maxmet pipeline densifies and matches MaxMet_Cleaned_PBI_Final") {
    val mine = MetricsPipelines.maxmet(spark)
    // scaffold invariant: contiguous daily spine
    val n = mine.count()
    val span = mine.agg(
      datediff(max(col("calendarDate")), min(col("calendarDate")))).head.getInt(0)
    assert(n == span + 1, "date spine must be dense")
    assertGolden(mine, None, "MaxMet_Cleaned_PBI_Final.csv",
      "calendarDate", minOverlap = 250)
  }

  test("race predictions match RacePredictions_Cleaned_PBI_Final") {
    val mine = MetricsPipelines.racePredictions(spark)
    assertGolden(mine, None, "RacePredictions_Cleaned_PBI_Final.csv",
      "calendarDate", minOverlap = 250)
  }

  test("training history matches TrainingHistory_Cleaned_PBI_Final") {
    val mine = MetricsPipelines.trainingHistory(spark)
    assertGolden(mine, None, "TrainingHistory_Cleaned_PBI_Final.csv",
      "calendarDate", minOverlap = 200)
  }

  test("uds pipeline matches UDS_Cleaned_PBI_Final on the raw overlap") {
    val mine = UdsPipeline.clean(spark)
    val mask = UdsPipeline.clean(spark, impute = false)
    assert(mine.columns.toSeq == UdsPipeline.finalColumns)
    // 2024-08-08 is the committed export's boundary day: the raw file
    // holds a truncated mid-day snapshot, while the golden was produced
    // from a later export with the complete day. Data artifact, not a
    // semantics difference.
    assertGolden(mine, Some(mask), "UDS_Cleaned_PBI_Final.csv",
      "calendarDate", minOverlap = 250, excludeKeys = Set("2024-08-08"))
  }

  test("training plan equals Training_Plan_PBI_Final row-for-row") {
    // The committed running CSV includes 4 runs newer than the golden
    // snapshot (golden ends 2024-12-14, running 2025-01-14); every golden
    // row must match exactly.
    val mine = RunningPipeline.trainingPlan(spark)
    assertGolden(mine, None, "Training_Plan_PBI_Final.csv",
      "Date", minOverlap = 60)
  }

  test("master table: one row per status day, ffilled metrics, run flags") {
    val m = MasterTable.build(spark).cache()
    val th = MetricsPipelines.trainingHistory(spark)
    assert(m.count() == th.count())
    assert(m.groupBy("calendarDate").count().filter(col("count") > 1).count() == 0)
    // after the first non-null, ffill leaves no vo2 gaps
    val firstVo2 = m.filter(col("vo2MaxValue").isNotNull)
      .agg(min(col("calendarDate"))).head.getDate(0)
    assert(m.filter(col("calendarDate") >= lit(firstVo2.toString) &&
      col("vo2MaxValue").isNull).count() == 0)
    assert(m.filter(!col("IsRunDay").isin(0, 1)).count() == 0)
    assert(m.filter(col("IsRunDay") === 1 && col("Distance") <= 0.0).count() == 0)
    m.unpersist()
  }
}
