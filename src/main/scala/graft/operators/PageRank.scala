package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Stabilize

/** PageRank by damped power iteration over an (src, dst) edge list —
  * the weighted-centrality sibling of [[Components]]' label
  * propagation, used by curation pipelines to weight sources/documents
  * by graph importance (link graphs, near-dup graphs, k-NN content
  * graphs) before sampling.
  *
  * Determinism contract (the seeded-Lloyd convention, see Ivf): every
  * iteration's ranks land on a 10^-`stabDecimals` grid
  * (Stabilize.stab) and each node's incoming contributions fold in
  * SOURCE order, so a DuckDB oracle replays all iterations
  * bit-exactly. The ordered fold costs a collect_list per node — the
  * price of certification; at production scale swap it for the plain
  * `sum` (same partial-agg shape, last-ulp-different answers) since
  * nothing downstream hashes the floats.
  *
  * 100 TB shape: each iteration is one equi-join of ranks onto edges
  * (both shuffled by src — the partitioning is reused across
  * iterations) and one groupBy(dst) aggregation; rank state is one
  * double per node, never materialized on the driver. Dangling nodes
  * (out-degree 0) simply leak their mass — the standard simplification;
  * k-regular graphs (k-NN edges) have none.
  */
object PageRank {

  /** Ranks after `iters` damped iterations from the uniform start:
    * r_0 = 1/N, r_{t+1}(v) = (1−d)/N + d·Σ_{u→v} r_t(u)/outdeg(u).
    * Output: (id, r) for every node appearing in `edges`.
    */
  def run(edges: DataFrame, damping: Double, iters: Int,
          stabDecimals: Int = 12): DataFrame = {
    // The loop-invariant frames are cached: without this every
    // iteration's lineage re-derives the edge list (and whatever
    // expensive candidate generation produced it) from scratch —
    // iteration t would re-run the k-NN build t times. Callers running
    // many graphs per session clearCache()/unpersist afterward (the
    // Verify/Bench runners already do).
    val e = edges.select(col("src"), col("dst")).cache()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct().cache()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("od")).cache()
    // Node count via ONE bounded driver action (a single long) instead
    // of a 1-row count frame crossJoined onto every rank row: same
    // doubles (IEEE division of the same operands), but the plans below
    // stay free of BroadcastNestedLoopJoin nodes — the graph-family
    // PlanSpec pins reject cartesian shapes wholesale.
    val n = nodes.count().toDouble
    var ranks = nodes.select(col("id"),
      Stabilize.stab(lit(1.0 / n), stabDecimals).as("r"))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst"), col("src"), (col("r") / col("od")).as("w"))
        .groupBy(col("dst"))
        .agg(aggregate(
          transform(array_sort(collect_list(struct(col("src"), col("w")))),
            x => x.getField("w")),
          lit(0.0), (acc, x) => acc + x).as("s"))
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"), Stabilize.stab(
          lit((1.0 - damping) / n)
            + lit(damping) * coalesce(col("s"), lit(0.0)),
          stabDecimals).as("r"))
    }
    ranks
  }
}
