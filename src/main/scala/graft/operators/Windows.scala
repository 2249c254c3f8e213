package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Ordered analytics (SURVEY §2.6 W1–W4).
  *
  * Reference: grouped `cumsum` after a global `sort_values('Date')`
  * (`2024 Marathon Training Analysis.ipynb:5006`), `shift(1, fill_value=0)`
  * (`ETL Scripts/transform_running_data.py:195,200`), `ffill()`
  * (`PBI ...Wrangling.ipynb:1559`).
  *
  * The reference sorts the whole frame globally before each grouped
  * cumulative op; folding the order into the window's ORDER BY removes the
  * global sort entirely — each group sorts independently after one hash
  * shuffle (SURVEY §4). Callers must pass a TOTAL order (tiebreaker
  * included) or results are nondeterministic under parallelism.
  */
object Windows {

  def grouped(keys: Seq[Column], order: Seq[Column]): WindowSpec =
    Window.partitionBy(keys: _*).orderBy(order: _*)

  /** W1 — grouped running sum over an explicit total order. */
  def runningSum(value: Column, keys: Seq[Column], order: Seq[Column]): Column =
    sum(value).over(grouped(keys, order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** W2 — grouped lag with default (pandas shift(1, fill_value=d)). */
  def lagWithDefault(value: Column, keys: Seq[Column], order: Seq[Column],
                     default: Any): Column =
    lag(value, 1, default).over(grouped(keys, order))

  /** W3 — forward fill: last non-null value up to the current row.
    * NOTE: an unpartitioned ffill (`keys = Nil`) serializes into a single
    * task — fine for small daily tables (the reference's use), wrong for
    * big fact tables; partition by a coarse key there.
    */
  def forwardFill(value: Column, keys: Seq[Column], order: Seq[Column]): Column =
    last(value, ignoreNulls = true).over(grouped(keys, order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** W3 at scale — GLOBAL forward fill without a global single-task
    * window. The caller supplies a `bucket` expression that is MONOTONE
    * non-decreasing along the total order and castable to long (e.g.
    * `year(ts)*12 + month(ts)` for a date order): (1) an in-bucket
    * ffill window runs every bucket in parallel; (2) each bucket's LAST
    * filled value — one tiny row per bucket — comes to the driver,
    * where a prefix scan computes the carry entering each bucket;
    * (3) a broadcast join patches the rows before a bucket's first
    * non-null. Only the per-bucket summary leaves the executors, so
    * this holds at any table size — the unpartitioned `forwardFill`
    * stays for bounded spines only. A data-derived bucket (rather than
    * a physical partition id) keeps the result deterministic under
    * re-partitioning, AQE, and replays.
    *
    * `order` must be a TOTAL order (include tiebreakers).
    */
  def forwardFillDistributed(df: DataFrame, valueCol: String,
                             order: Seq[Column],
                             bucket: Column): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val bk = Dedup.freshName(df, "__ffbk")
    val bucketed = df.withColumn(bk, bucket.cast("long"))
    val w = Window.partitionBy(col(bk)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = bucketed.withColumn(valueCol,
      last(col(valueCol), ignoreNulls = true).over(w))
    // per-bucket carry-out = last row's value after the in-bucket fill;
    // null iff the whole bucket is null
    // One tiny row per bucket crosses to the driver — that bound is the
    // contract; bucket count must stay driver-sized (e.g. one per month).
    val lasts = filled.groupBy(col(bk))
      .agg(max_by(col(valueCol), struct(order: _*)).as("__blast"))
      .collect().map { r =>
        require(!r.isNullAt(0),
          s"forwardFillDistributed: bucket expression evaluated to NULL " +
            s"for some rows; the bucket must be non-null and monotone " +
            s"along the order (fix the bucket expr or filter null keys)")
        r.getLong(0) -> r.get(1)
      }.sortBy(_._1)
    // prefix scan on the driver: carry INTO each bucket
    var running: Any = null
    val carries = lasts.map { case (b, blast) =>
      val in = running
      if (blast != null) running = blast
      Row(b, in)
    }
    val valueField = df.schema(valueCol)
    // collision-proof carry-frame names (same discipline as Impute)
    val fb = Dedup.freshName(filled, "__ffb")
    val fc = Dedup.freshName(filled, "__ffcarry")
    val carrySchema = StructType(Seq(StructField(fb, LongType),
      StructField(fc, valueField.dataType)))
    val carryDf = spark.createDataFrame(
      spark.sparkContext.parallelize(carries.toSeq, 1), carrySchema)
    filled.join(broadcast(carryDf), col(bk) === col(fb), "left")
      .withColumn(valueCol, coalesce(col(valueCol), col(fc)))
      .drop(bk, fb, fc)
  }

  /** W1 at scale — GLOBAL running sum without a global single-task
    * window, same bucket-carry shape as [[forwardFillDistributed]]:
    * (1) in-bucket cumulative sums run every bucket in parallel;
    * (2) one total per bucket comes to the driver for an exclusive
    * prefix scan; (3) a broadcast join adds each bucket's carry-in.
    * Only the per-bucket totals leave the executors, so this holds at
    * any size. `bucket` must be MONOTONE non-decreasing along `order`
    * and castable to long; `valueCol` must be integral (LongType) so
    * partial sums are exact under any grouping. Result column `outCol`.
    */
  def runningSumDistributed(df: DataFrame, valueCol: String, outCol: String,
                            order: Seq[Column], bucket: Column): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val bk = Dedup.freshName(df, "__rsbk")
    val bucketed = df.withColumn(bk, bucket.cast("long"))
    val w = Window.partitionBy(col(bk)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn(outCol,
      sum(col(valueCol).cast("long")).over(w))
    // one row per bucket to the driver (the documented bound)
    val totals = bucketed.groupBy(col(bk))
      .agg(sum(col(valueCol).cast("long")).as("__btotal"))
      .collect().map { r =>
        require(!r.isNullAt(0),
          "runningSumDistributed: bucket expression evaluated to NULL")
        r.getLong(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1))
      }.sortBy(_._1)
    var running = 0L
    val offsets = totals.map { case (b, t) =>
      val in = running; running += t; Row(b, in)
    }
    // collision-proof offset-frame names (same discipline as Impute)
    val rb = Dedup.freshName(local, "__rsb")
    val rc = Dedup.freshName(local, "__rscarry")
    val offSchema = StructType(Seq(StructField(rb, LongType),
      StructField(rc, LongType)))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.toSeq, 1), offSchema)
    local.join(broadcast(offDf), col(bk) === col(rb), "left")
      .withColumn(outCol, col(outCol) + coalesce(col(rc), lit(0L)))
      .drop(bk, rb, rc)
  }

  /** W4 — rank rows within groups (top-k per group when filtered). */
  def rowNumber(keys: Seq[Column], order: Seq[Column]): Column =
    row_number().over(grouped(keys, order))

  /** Top-k per group with deterministic tiebreak ordering. */
  def topKPerGroup(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                   k: Int): DataFrame = {
    val rk = Dedup.freshName(df, "__rk")
    topKPerGroupRanked(df, keys, order, k, rk).drop(rk)
  }

  /** [[topKPerGroup]] KEEPING the rank as `rankCol` (1-based). Callers
    * that output the rank use this instead of re-computing an identical
    * row_number over a second Window node (the ANN/BM25/RRF call sites
    * all did exactly that before this existed — one window, one sort).
    */
  def topKPerGroupRanked(df: DataFrame, keys: Seq[Column],
                         order: Seq[Column], k: Int,
                         rankCol: String): DataFrame =
    df.withColumn(rankCol, rowNumber(keys, order))
      .filter(col(rankCol) <= k)
}
