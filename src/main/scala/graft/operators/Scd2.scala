package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension history from a change log — the
  * warehouse-side sibling of the JDBC MERGE upsert (sinks/Jdbc): where
  * the upsert keeps only the LATEST state per key, SCD2 keeps every
  * distinct state as a [valid_from, valid_to) interval with an
  * `is_current` flag, the shape dimension tables take when history
  * must survive (reference seam: the pipeline's keep-latest dedup
  * family, `transform_all_datasets.py` sort+drop_duplicates, is the
  * degenerate one-interval-per-key case of this).
  *
  * Plan shape: ONE hash shuffle on the keys feeds both windows (change
  * -point detection via lag, interval close via lead — same partition
  * key and ordering, so Catalyst plans a single Exchange + sort).
  * Consecutive equal states compact away BEFORE the second window, so
  * the lead pass runs over change points only. A hot key serializes
  * into one task like any ordered-history operator — but the per-key
  * data is a dimension's change history, bounded in practice; for
  * hot-key-prone EVENT streams use Sessionize/Windows instead.
  *
  * Null-safety: state comparison uses `<=>` (null-safe equality), so a
  * NULL attribute is a real state, distinct from any non-null one and
  * equal to itself — pandas/SQL `IS DISTINCT FROM` semantics.
  */
object Scd2 {

  /** Compact a change log into SCD2 intervals.
    *
    * @param df      change log (one row per observation)
    * @param keys    dimension identity columns
    * @param attrs   tracked attribute columns (state = this tuple)
    * @param tsCol   observation time column (becomes valid_from)
    * @param tiebreak extra columns making (tsCol, tiebreak) a total
    *                 order per key — required for determinism when one
    *                 timestamp carries several observations
    */
  def fromChangeLog(df: DataFrame, keys: Seq[String], attrs: Seq[String],
                    tsCol: String, tiebreak: Seq[Column] = Nil): DataFrame = {
    val ord = col(tsCol) +: tiebreak
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val state = struct(attrs.map(col): _*)
    val prev = Dedup.freshName(df, "__prev")
    val changePoints = df
      .withColumn(prev, lag(state, 1).over(w))
      .filter(!(col(prev) <=> state))
      .drop(prev)
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    changePoints
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keys.map(col) ++ attrs.map(col) ++ Seq(col("valid_from"),
        col("valid_to"), col("is_current"))): _*)
  }
}
