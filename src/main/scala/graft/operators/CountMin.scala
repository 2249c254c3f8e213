package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.HashFns

/** Count-min sketch: fixed-size frequency estimation — the frequency
  * sibling of the HLL distinct-count certification
  * (q_profile_approx_distinct). A d×w grid of counters where every
  * item increments one cell per row (bucket = family-hash mod w);
  * `estimate(x) = min over rows of cell[d][h_d(x)]` is never below the
  * true count and overshoots only by colliding keys' mass (one-sided
  * ε ≈ e/w error with probability 1 − e^−d).
  *
  * 100 TB shape: the sketch build is ONE partial-aggregated groupBy
  * over (d, bucket) — the shuffle carries at most d×w counter rows per
  * map task regardless of corpus size or key cardinality, and sketches
  * merge by cell-wise addition (exactly what Spark's partial
  * aggregation does), so the same operator serves batch, incremental
  * union, and streaming state. Estimation probes broadcast the d×w
  * table. Hashes are the md5-derived engine-portable family (HashFns),
  * so a DuckDB oracle replays every cell and estimate bit-exactly.
  */
object CountMin {

  /** Build the sketch over `items(itemCol)`: one (d, bucket, c) row per
    * non-empty cell (c = exact cell count; zero cells are implicit).
    */
  def sketch(items: DataFrame, itemCol: String,
             depth: Int, width: Int): DataFrame =
    items.select(posexplode(buckets(itemCol, depth, width)).as(Seq("d", "bucket")))
      .groupBy(col("d"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Count-min estimates for `keys(itemCol)` (distinct keys): joins the
    * broadcast sketch on (d, bucket) and takes the per-key min. Keys
    * whose cells are all absent from the sketch were never inserted —
    * an inner join drops them (estimate 0 by convention).
    */
  def estimate(keys: DataFrame, itemCol: String, sk: DataFrame,
               depth: Int, width: Int): DataFrame = {
    // probe under fresh names so a caller column named d/bucket/c can
    // neither collide in the join nor be grouped/aggregated by mistake
    val d = Dedup.freshName(keys, "__cm_d")
    val b = Dedup.freshName(keys, "__cm_bucket")
    val cv = Dedup.freshName(keys, "__cm_c")
    keys.select(col("*"),
        posexplode(buckets(itemCol, depth, width)).as(Seq(d, b)))
      .join(broadcast(sk.select(col("d").as(d), col("bucket").as(b),
        col("c").as(cv))), Seq(d, b))
      .groupBy(keys.columns.map(col).toIndexedSeq: _*)
      .agg(min(col(cv)).as("cm_estimate"))
  }

  /** The d bucket positions of one item: family-hash i of the item's
    * md5-long, mod `width` (family hashes are non-negative, so `%` is
    * portable across engines without pmod gymnastics).
    */
  private def buckets(itemCol: String, depth: Int, width: Int) =
    array((0 until depth).map(i =>
      (HashFns.hashFamily(HashFns.md5Long(col(itemCol)), i) % width)
        .cast("int")): _*)
}
