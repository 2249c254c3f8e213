package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed 2D Pareto frontier (skyline) — the data-selection
  * primitive behind "keep the documents that are not beaten on BOTH
  * quality axes at once" curation: a row survives iff no other row is
  * >= on both dimensions and strictly > on at least one (both
  * dimensions MAXIMIZED; negate a column to minimize it). Rows tied on
  * exactly the same (x, y) do not dominate each other — all of them
  * survive together.
  *
  * Scale shape (100 TB): the naive skyline is an all-pairs anti-join;
  * a single global sort-scan is one task wide. This instead:
  *   1. bins x into `bins` equi-width buckets (one tiny agg for the
  *      range, map-only bucketing);
  *   2. computes each bucket's max y (partial-aggregated groupBy into
  *      <= `bins` rows) and the suffix-max over strictly-higher
  *      buckets (a window over the <= `bins`-row frame — driver-free
  *      and trivially small);
  *   3. broadcast-joins that back and PREFILTERS: any row whose y is
  *      <= the max y of a strictly-higher bucket is dominated by that
  *      bucket's witness (its x is strictly greater by the bin
  *      geometry), so only near-frontier candidates survive — the
  *      survivor set is bounded by the frontier's staircase width per
  *      bucket, not the corpus;
  *   4. resolves the survivors exactly with distinct-x suffix-max
  *      logic (windows over the SMALL candidate frame only).
  *
  * The prefilter never drops a frontier point: a frontier point by
  * definition has no dominator, so its y strictly exceeds every
  * higher-bucket max. Degenerate x-range (all x equal) falls back to
  * one bucket — the prefilter becomes a no-op and the exact pass
  * still answers correctly.
  */
object Pareto {

  /** Rows of `df` on the Pareto frontier of (`xCol` max, `yCol` max).
    * Output schema = input schema, row set = the non-dominated rows.
    */
  def frontier2D(df: DataFrame, xCol: String, yCol: String,
                 bins: Int = 256): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")

    val range = df.agg(min(x).as("__xlo"), max(x).as("__xhi"))
    val binned = df.crossJoin(broadcast(range))
      .withColumn("__w", (col("__xhi") - col("__xlo")) / bins)
      .withColumn("__bin",
        when(col("__w") > 0,
          least(floor((x - col("__xlo")) / col("__w")), lit(bins - 1L)))
          .otherwise(0L).cast("long"))
      .drop("__xlo", "__xhi", "__w")

    val perBin = binned.groupBy(col("__bin")).agg(max(y).as("__bmy"))
    // Suffix-max over STRICTLY higher buckets; <= `bins` rows, so the
    // unpartitioned window is a bounded-size frame, not a corpus sort.
    val wAbove = Window.orderBy(col("__bin").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val binStats = perBin
      .withColumn("__bsmax", max(col("__bmy")).over(wAbove))
      .select(col("__bin"), col("__bsmax"))
    val candidates = binned
      .join(broadcast(binStats), Seq("__bin"))
      .filter(col("__bsmax").isNull || y > col("__bsmax"))
      .drop("__bin", "__bsmax")

    // Exact pass on the small candidate set: per distinct x its max y,
    // then the suffix-max over strictly greater x; a candidate is on
    // the frontier iff it holds its x's max y and beats every
    // higher-x max.
    val perX = candidates.groupBy(x.as("__x")).agg(max(y).as("__my"))
    val wX = Window.orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontierX = perX
      .withColumn("__smax", max(col("__my")).over(wX))
      .filter(col("__smax").isNull || col("__my") > col("__smax"))
      .select(col("__x"), col("__my"))
    candidates
      .join(broadcast(frontierX),
        x === col("__x") && y === col("__my"))
      .drop("__x", "__my")
  }
}
