package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Skew-safe top-k per group: a bounded-buffer AGGREGATE instead of a
  * row_number window.
  *
  * The window form (operators/Windows.topKPerGroup) sorts each key's
  * rows inside one task — one pathologically hot group at 100 TB
  * serializes there (AQE splits skewed join/aggregate partitions, not
  * window partitions). This form is a typed Aggregator whose state is
  * the top-k buffer itself: map-side combine reduces a hot key to k
  * rows PER MAP TASK before the shuffle, and the merge of two buffers
  * is a bounded sorted merge — O(k) state however large the group.
  * Same answer as the window under the same total order (value DESC,
  * id ASC; ties are exact, not arbitrary). The trade: a udaf runs as
  * ObjectHashAggregate outside whole-stage codegen — the price of
  * bounded state, paid per ROW only on the map side.
  */
object TopK {

  /** Buffer entries ordered by (value DESC, id ASC); both `reduce` and
    * `merge` keep the buffer sorted and truncated to k, so partial
    * aggregation is associative and commutative over the total order.
    */
  private final class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)],
        Seq[(Double, Long)]] {
    private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    def zero: Seq[(Double, Long)] = Nil
    def reduce(buf: Seq[(Double, Long)],
               x: (Double, Long)): Seq[(Double, Long)] =
      if (buf.lengthCompare(k) >= 0 && lt(buf.last, x)) buf
      else ((buf :+ x).sortWith(lt)).take(k)
    def merge(a: Seq[(Double, Long)],
              b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      (a ++ b).sortWith(lt).take(k)
    def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
    def bufferEncoder: ExpressionEncoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
    def outputEncoder: ExpressionEncoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Ascending k-min buffer over (hash, id) LONG pairs — the exact
    * sibling of [[TopKAgg]] for hash-ranked draws (negative sampling,
    * reservoir-style deterministic selection) where the rank key is a
    * 60-bit portable hash that a double would corrupt. Total order:
    * (hash ASC, id ASC); dedup-free (pairs are unique by construction
    * when `id` is unique per group).
    */
  private final class KMinPairsAgg(k: Int)
      extends Aggregator[(Long, Long), Seq[(Long, Long)],
        Seq[(Long, Long)]] {
    private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
    def zero: Seq[(Long, Long)] = Nil
    def reduce(buf: Seq[(Long, Long)],
               x: (Long, Long)): Seq[(Long, Long)] =
      if (buf.lengthCompare(k) >= 0 && lt(buf.last, x)) buf
      else ((buf :+ x).sortWith(lt)).take(k)
    def merge(a: Seq[(Long, Long)],
              b: Seq[(Long, Long)]): Seq[(Long, Long)] =
      (a ++ b).sortWith(lt).take(k)
    def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r
    def bufferEncoder: ExpressionEncoder[Seq[(Long, Long)]] =
      ExpressionEncoder[Seq[(Long, Long)]]()
    def outputEncoder: ExpressionEncoder[Seq[(Long, Long)]] =
      ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** The k SMALLEST (`hashCol`, `idCol`) pairs per key group, emitted
    * with a 1-based `rank` — bit-identical to
    * `row_number() OVER (PARTITION BY keys ORDER BY hash, id) <= k`,
    * but as a bounded-buffer aggregate: map-side combine reduces each
    * group to k pairs PER MAP TASK before the shuffle. When upstream
    * fans each group's candidates out inside one task (a broadcast
    * join), the shuffle carries k rows per group instead of the whole
    * candidate frame — the negative-sampling case measured candidates/k
    * = 333× shuffle-volume reduction at sf10.
    */
  def kMinPairsPerGroup(df: DataFrame, keys: Seq[String], hashCol: String,
                        idCol: String, k: Int,
                        rankCol: String): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val km = udaf(new KMinPairsAgg(k))
    df.groupBy(keys.map(col): _*)
      .agg(km(col(hashCol).cast("long"), col(idCol).cast("long"))
        .as("__kmin"))
      .select(keys.map(col) :+ posexplode(col("__kmin")): _*)
      .select(keys.map(col) ++ Seq(
        (col("pos") + 1).cast("long").as(rankCol),
        col("col._1").as(hashCol), col("col._2").as(idCol)): _*)
  }

  /** Top-k rows per key group by (`valueCol` DESC, `idCol` ASC),
    * emitted as one row per kept entry with a 1-based `rank`. Null
    * values are excluded (they cannot rank). `idCol` must be a
    * bigint-compatible unique id; `valueCol` anything castable to
    * double.
    */
  def topKPerGroupAgg(df: DataFrame, keys: Seq[String], valueCol: String,
                      idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val tk = udaf(new TopKAgg(k))
    df.filter(col(valueCol).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(tk(col(valueCol).cast("double"), col(idCol).cast("long"))
        .as("__topk"))
      .select(keys.map(col) :+ posexplode(col("__topk")): _*)
      .select(keys.map(col) ++ Seq(
        (col("pos") + 1).cast("long").as("rank"),
        col("col._1").as(valueCol), col("col._2").as(idCol)): _*)
  }
}
