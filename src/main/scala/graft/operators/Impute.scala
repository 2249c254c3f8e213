package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Mean imputation (SURVEY §2.5 A8).
  *
  * Reference: fill float columns with their column mean
  * (`ETL Scripts/transform_all_datasets.py:115-119`,
  * `PBI ...Wrangling.ipynb` cells "fillna(combined.mean(numeric_only))").
  *
  * Scale shape: ONE aggregate pass computes every column's mean (map-side
  * partial aggregation, one tiny shuffle), then a broadcast cross join of
  * the 1-row means frame feeds a fully parallel `coalesce` projection.
  * Never an unpartitioned window (VERDICT r1: that funnels the whole
  * table through a single task).
  */
object Impute {

  /** Fill nulls in `cols` (default: every DoubleType column) with the
    * column's mean. Columns that are entirely null stay null (their mean
    * is null), matching pandas.
    */
  def meanFill(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val targets =
      if (cols.nonEmpty) cols
      else df.schema.fields.toSeq.collect {
        case f if f.dataType == DoubleType => f.name
      }
    if (targets.isEmpty) df
    else {
      // Collision-proof helper prefix (same discipline as Dedup.freshName):
      // an input frame that already has a __mean_<target> column must not
      // shadow the computed means.
      val prefix = Iterator.from(0)
        .map(i => if (i == 0) "__mean_" else s"__mean${i}_")
        .find(p => !df.columns.exists(_.startsWith(p))).get
      val means = df.agg(
        avg(col(targets.head)).as(s"$prefix${targets.head}"),
        targets.tail.map(c => avg(col(c)).as(s"$prefix$c")): _*)
      val joined = df.crossJoin(broadcast(means))
      val filled = df.columns.toSeq.map { c =>
        if (targets.contains(c)) coalesce(col(c), col(s"$prefix$c")).as(c)
        else col(c)
      }
      joined.select(filled: _*)
    }
  }
}
