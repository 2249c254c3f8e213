package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date densification (SURVEY §2.7 J2): build a complete calendar spine
  * between the min and max of a date column, left-join the sparse table
  * onto it, then (optionally) forward-fill.
  *
  * Reference: `pd.date_range(min,max)` + `reindex` + `ffill`
  * (`PBI ...Wrangling.ipynb:1559`, `ML_Model_...ipynb:613`).
  *
  * Scale posture (SURVEY §7.4#8): the spine is generated DISTRIBUTED via
  * `sequence()` + `explode` from a 1-row aggregate — never a driver-side
  * range — so a 100-year daily spine or a seconds-grain spine behaves the
  * same. The spine side is tiny relative to facts, so Spark broadcasts it.
  */
object Scaffold {

  /** Calendar spine: one row per day in [min(dateCol), max(dateCol)]. */
  def dateSpine(df: DataFrame, dateCol: String,
                spineName: String = "spine_date"): DataFrame =
    df.agg(min(to_date(col(dateCol))).as("lo"), max(to_date(col(dateCol))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 day"))).as(spineName))

  /** Densify: spine LEFT JOIN df on date equality. */
  def densify(df: DataFrame, dateCol: String): DataFrame = {
    val spine = dateSpine(df, dateCol)
    spine.join(df, spine("spine_date") === to_date(df(dateCol)), "left")
  }
}
