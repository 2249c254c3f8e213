package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Ordered binning with labels + stable ids (SURVEY §2.4 F18/F19).
  * Reference: `ETL Scripts/transform_running_data.py:58-81` (pd.cut with
  * left-closed buckets + a hand-rolled label->id dict).
  *
  * Implemented as a chained `when` (exact label parity with pd.cut,
  * codegen'd, no UDF). Bounds are half-open [lo, hi).
  */
object Bins {
  final case class Bin(lo: Double, hi: Double, label: String, id: Int)

  /** Distance buckets from the reference: [0,3,5,7,10,13,inf). */
  val distanceBins: Seq[Bin] = Seq(
    Bin(0, 3, "0-3km", 1), Bin(3, 5, "3-5km", 2), Bin(5, 7, "5-7km", 3),
    Bin(7, 10, "7-10km", 4), Bin(10, 13, "10-13km", 5),
    Bin(13, Double.PositiveInfinity, "13km+", 6))

  def binLabel(c: Column, bins: Seq[Bin]): Column =
    bins.foldLeft(lit(null).cast("string")) { (acc, b) =>
      val cond =
        if (b.hi.isPosInfinity) c >= b.lo
        else c >= b.lo && c < b.hi
      when(cond, lit(b.label)).otherwise(acc)
    }

  def binId(c: Column, bins: Seq[Bin]): Column =
    bins.foldLeft(lit(null).cast("int")) { (acc, b) =>
      val cond =
        if (b.hi.isPosInfinity) c >= b.lo
        else c >= b.lo && c < b.hi
      when(cond, lit(b.id)).otherwise(acc)
    }
}
