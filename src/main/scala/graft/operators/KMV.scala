package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch with SET-OPERATION
  * estimation (Bar-Yossef et al. 2002; Beyer et al., "On Synopses for
  * Distinct-Value Estimation Under Multiset Operations", SIGMOD 2007 —
  * re-derived from the published estimators, not copied).
  *
  * The gap this fills next to the HLL path (Profile.stats(exact=false),
  * certified by q_profile_approx_distinct): HLL estimates |A| and, via
  * sketch union, |A∪B| — but it cannot estimate INTERSECTIONS without
  * inclusion-exclusion error blowup. A KMV sketch is a uniform sample
  * of the distinct-value domain, so one pair of sketches yields
  * |A∩B|, |A∪B|, and Jaccard directly:
  *
  *   - D(S)    ≈ (k−1) · 2^60 / h_(k)   (k-th smallest 60-bit hash;
  *               exact count when the group holds fewer than k values)
  *   - L       = the k smallest of K(A) ∪ K(B)  (= K(A∪B): the merge
  *               IS a KMV sketch of the union — closure under union)
  *   - Jaccard ≈ |L ∩ K(A) ∩ K(B)| / |L|
  *   - |A∩B|   ≈ Jaccard · D(A∪B)
  *
  * 100 TB shape: the sketch is a bounded typed Aggregator — state is
  * the ascending k-min buffer itself, so map-side combine reduces any
  * group to k longs per task before the one shuffle on the group key,
  * and merging two buffers is a bounded sorted merge. Per-shard
  * sketches are write-once artifacts: cross-corpus overlap questions
  * ("how much of crawl B is already in crawl A?") are answered by
  * merging k-long arrays, never by re-scanning or joining the corpora.
  * Hashes are HashFns.md5Long (uniform on [0, 2^60)), so the whole
  * construction — sketch, estimates, set operations — replays
  * bit-exactly in the DuckDB oracle.
  */
object KMV {

  /** Ascending k-min buffer over 60-bit hashes. Input need NOT be
    * pre-deduplicated: `reduce` and `merge` both dedup (KMV is defined
    * over distinct values), which keeps the plan at ONE shuffle on the
    * group key instead of a (group, hash) distinct plus a re-shuffle.
    */
  private final class KMinAgg(k: Int)
      extends Aggregator[Long, Seq[Long], Seq[Long]] {
    def zero: Seq[Long] = Nil
    def reduce(buf: Seq[Long], h: Long): Seq[Long] =
      if (buf.lengthCompare(k) >= 0 && buf.last <= h) buf
      else if (buf.contains(h)) buf
      else ((buf :+ h).sorted).take(k)
    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      (a ++ b).distinct.sorted.take(k)
    def finish(r: Seq[Long]): Seq[Long] = r
    def bufferEncoder: ExpressionEncoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
    def outputEncoder: ExpressionEncoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** One row per group: (`groupCol`, kmins array<long> ascending).
    * `hashCol` must already hold md5Long hashes (longs in [0, 2^60)).
    */
  def sketch(df: DataFrame, groupCol: String, hashCol: String,
             k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val km = udaf(new KMinAgg(k))
    df.filter(col(hashCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(km(col(hashCol)).as("kmins"))
  }

  /** The KMV order-statistic estimate as a Column over a `kmins`
    * array: exact size below k, (k−1)·2^60/h_(k) at k. The numerator
    * is a compile-time double with trailing zero bits, so the single
    * division is the only rounding step — bit-identical in DuckDB as
    * (CAST(k−1 AS DOUBLE) * POWER(CAST(2 AS DOUBLE), 60)) / hk.
    */
  def estimateDistinct(kmins: org.apache.spark.sql.Column,
                       k: Int): org.apache.spark.sql.Column =
    when(size(kmins) < k, size(kmins).cast("double"))
      .otherwise(lit((k - 1).toDouble * math.pow(2.0, 60)) /
        element_at(kmins, k).cast("double"))
}
