package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization: assign a session id per user by splitting the
  * user's event stream wherever the gap to the previous event exceeds
  * `gapSeconds` (classic lag-gap → cumulative-flag pattern).
  *
  * Scale shape: ONE hash shuffle on the user key; each user's events sort
  * within their partition (no global sort). Session ids are per-user
  * ordinals (1,2,3…), so they are deterministic given a total order —
  * callers must pass a tiebreaker (e.g. an event id) alongside the
  * timestamp. At 100 TB the only risk is a single pathological user
  * (bot) skewing one task — mitigated by AQE skew handling; the window
  * itself never materializes more than one user per task.
  */
object Sessionize {

  /** Adds `sessionCol` (long, 1-based per user). `order` must be a total
    * order within a user (timestamp + id tiebreak).
    */
  def sessionize(df: DataFrame, userCol: Column, tsCol: Column,
                 order: Seq[Column], gapSeconds: Long,
                 sessionCol: String = "session_id"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(order: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = gapSeconds * 1000000L
    val prev = lag(unix_micros(tsCol), 1).over(w)
    val newSession =
      when(prev.isNull || unix_micros(tsCol) - prev > gapUs, 1L).otherwise(0L)
    val nm = Dedup.freshName(df, "__new_session")
    df.withColumn(nm, newSession)
      .withColumn(sessionCol, sum(col(nm)).over(run))
      .drop(nm)
  }
}
