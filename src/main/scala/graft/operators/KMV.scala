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
    import scala.collection.immutable.ArraySeq
    def zero: Seq[Long] = ArraySeq.empty[Long]
    // The buffer invariant is "ascending, distinct, |buf| <= k", so
    // membership and insertion position come from ONE binary search
    // and each accepted element is a single O(k) array splice — not
    // the r13-advice linear contains + full re-sort. Results are
    // bit-identical to the sorted-set definition by construction.
    private def arr(s: Seq[Long]): Array[Long] = s match {
      case as: ArraySeq[_] if as.unsafeArray.isInstanceOf[Array[Long]] =>
        as.unsafeArray.asInstanceOf[Array[Long]]
      case _ => s.toArray
    }
    def reduce(buf: Seq[Long], h: Long): Seq[Long] = {
      val a = arr(buf); val n = a.length
      if (n >= k && a(n - 1) <= h) buf
      else {
        val i = java.util.Arrays.binarySearch(a, h)
        if (i >= 0) buf // present already: KMV is over distinct values
        else {
          val ins = -i - 1
          val m = math.min(n + 1, k)
          val out = new Array[Long](m)
          System.arraycopy(a, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(a, ins, out, ins + 1, m - ins - 1)
          ArraySeq.unsafeWrapArray(out)
        }
      }
    }
    def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = {
      // bounded two-pointer sorted merge with dedup — both inputs hold
      // the ascending-distinct invariant, so out(o-1) != v suffices
      val a = arr(x); val b = arr(y)
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) {
            val t = a(i); i += 1; t
          } else { val t = b(j); j += 1; t }
        if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
      }
      ArraySeq.unsafeWrapArray(
        if (o == out.length) out else java.util.Arrays.copyOf(out, o))
    }
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

  /** Mergeable KMV CATALOG (the lifecycle face of [[sketch]], mirroring
    * Profile.distinctSketchCatalog's incremental-profile pattern): one
    * k-min sketch per partition key (a day) PERSISTED to `catalogDir`
    * with dynamic partition overwrite — a new day's rows rewrite only
    * that day's partition; history is never re-scanned. Cross-period
    * distinct questions are then answered by merging the STORED k-long
    * arrays (KMV is closed under union: the k smallest distinct hashes
    * of the merged arrays ARE the union's sketch), here via the same
    * bounded aggregator over the exploded catalog — days × k tiny rows
    * however big the underlying data. Per-day exact distincts ride
    * along so the catalog's claims stay oracle-checkable.
    *
    * `catalogDir` MUST be dataset-scoped by the caller (the
    * QueriesSources.dsScoped contract): dynamic overwrite preserves
    * partitions absent from the current input — exactly right for
    * incremental maintenance, exactly wrong across datasets sharing a
    * directory (the r13 hll_catalog red row).
    *
    * Returned report: (n_days, sum_day_distinct, exact_distinct,
    * est_distinct). Unlike the HLL catalog's 5%-tolerance boolean,
    * est_distinct is pinned EXACTLY by the DuckDB oracle — md5Long
    * hashes plus one order-statistic division replay bit-for-bit.
    * The exact_distinct face recomputes over the frame it is given
    * (test-scale certification); at 100 TB you maintain the catalog
    * with new-day frames and answer from the merged sketches alone.
    */
  def sketchCatalog(df: DataFrame, dayCol: org.apache.spark.sql.Column,
                    hashCol: String, k: Int,
                    catalogDir: String): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val km = udaf(new KMinAgg(k))
    val daily = df.filter(col(hashCol).isNotNull)
      .groupBy(dayCol.as("day"))
      .agg(km(col(hashCol)).as("kmins"),
        count_distinct(col(hashCol)).as("exact_day"))
    daily.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day")
      .parquet(catalogDir)
    // Empty first input → partition-less dir → read.parquet throws.
    // A never-written catalog is a valid state: no days, no distincts
    // (the readKmvSketch empty-state convention, r14 advice).
    if (!CountMin.catalogHasDays(df, catalogDir))
      return df.sparkSession.range(1).select(
        lit(0L).as("n_days"), lit(0L).as("sum_day_distinct"),
        lit(0L).as("exact_distinct"), lit(0.0).as("est_distinct"))
    val catalog = df.sparkSession.read.parquet(catalogDir)
    val merged = mergeSketchArrays(catalog, "kmins", k)
    val counts = catalog.agg(
      count(lit(1)).as("n_days"),
      sum(col("exact_day")).as("sum_day_distinct"))
    val exact = df.agg(count_distinct(col(hashCol)).as("exact_distinct"))
    merged.crossJoin(broadcast(counts)).crossJoin(broadcast(exact))
      .select(col("n_days"), col("sum_day_distinct"),
        col("exact_distinct"),
        estimateDistinct(col("kmins"), k).as("est_distinct"))
  }

  /** Merge a frame of `kmins` arrays (per-day catalog rows, per-batch
    * stream partials, per-shard artifacts) into ONE union sketch: the
    * k smallest distinct hashes across all arrays — KMV's closure
    * under union, through the same bounded aggregator. Input is
    * `n_arrays × k` tiny rows however big the underlying data.
    */
  def mergeSketchArrays(df: DataFrame, kminsCol: String,
                        k: Int): DataFrame = {
    val km = udaf(new KMinAgg(k))
    df.select(explode(col(kminsCol)).as("h"))
      .agg(km(col("h")).as("kmins"))
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
