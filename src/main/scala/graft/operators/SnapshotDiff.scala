package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot CDC: classify every key across two snapshots of the same
  * table as insert / delete / update (unchanged rows are dropped — at
  * lake scale they are the overwhelming majority, and emitting them
  * would make the diff as large as the snapshot). The inverse of the
  * SCD2/MERGE maintenance sinks (sinks/Jdbc): those APPLY a change
  * stream; this RECOVERS the change stream from two full snapshots —
  * the standard bootstrap when an upstream system can only dump.
  *
  * Scale shape: ONE full-outer sort-merge join on the key columns (AQE
  * splits skewed keys for joins), null-safe column compares, no window
  * and no driver state. Both snapshots are scans with key + compared
  * columns pruned — the diff of two 100 TB snapshots shuffles only the
  * projected columns.
  */
object SnapshotDiff {

  /** Diff `oldDf` -> `newDf` on `keys`, comparing `tracked` columns.
    * Output: keys, change_type ('insert'|'delete'|'update'), and
    * old_/new_ prefixed tracked columns (null on the absent side).
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
           tracked: Seq[String]): DataFrame = {
    require(keys.nonEmpty && tracked.nonEmpty,
      "snapshot diff needs key and tracked columns")
    val o = oldDf.select((keys ++ tracked).map(col): _*)
      .withColumn("__in_old", lit(true))
      .toDF(keys ++ tracked.map("old_" + _) :+ "__in_old": _*)
    val n = newDf.select((keys ++ tracked).map(col): _*)
      .withColumn("__in_new", lit(true))
      .toDF(keys ++ tracked.map("new_" + _) :+ "__in_new": _*)
    val changed = tracked
      .map(c => !(col("old_" + c) <=> col("new_" + c)))
      .reduce(_ || _)
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, lit("insert"))
          .when(col("__in_new").isNull, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("change_type").isNotNull)
      .select((keys.map(col) :+ col("change_type")) ++
        tracked.flatMap(c => Seq(col("old_" + c), col("new_" + c))): _*)
  }
}
