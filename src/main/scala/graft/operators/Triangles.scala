package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Degree-ordered triangle counting (the MapReduce-classic of Suri &
  * Vassilvitskii, "Counting Triangles and the Curse of the Last
  * Reducer", WWW 2011 — re-derived). Triangles are the primitive under
  * clustering coefficients, community detection, and near-dup-graph
  * densification checks on the similarity graphs this engine builds
  * (kNN / LSH edges).
  *
  * Why degree-ordering: enumerating wedges at every vertex costs
  * Σ deg(v)² — a single celebrity node makes one reducer quadratic.
  * Orienting every undirected edge from its lower-(degree, id) endpoint
  * to the higher bounds every vertex's OUT-degree by O(√m), so wedge
  * work is Σ outdeg(v)² = O(m^1.5) total and, crucially, evenly spread:
  * the hot vertex's edges are almost all INcoming and generate their
  * wedges at their (low-degree) other endpoints instead ("the curse of
  * the last reducer" is the un-oriented version). Each triangle is then
  * found exactly once, at its minimum vertex.
  *
  * Plan shape: one aggregate for degrees, two broadcast-or-shuffle
  * joins to attach them, a self-join on the wedge apex, and one
  * equi-join closing wedges against oriented edges — all hash joins on
  * ids, no window, no driver state.
  */
object Triangles {

  private def ordLt(d1: Column, i1: Column, d2: Column, i2: Column) =
    (d1 < d2) || (d1 === d2 && i1 < i2)

  /** Per-node triangle participation counts over an edge frame with
    * `src`/`dst` columns (direction and duplicates ignored; self-loops
    * dropped). Output: (id, n_tri) for every node in >= 1 triangle.
    */
  def perNode(edges: DataFrame): DataFrame = {
    // cached: the undirected edge list is consumed by the degree
    // aggregate, the orientation join, the wedge self-join, and the
    // closure join — without the cache every consumer re-evaluates the
    // caller's (possibly expensive) edge derivation. Size is O(m),
    // the same frame every stage shuffles anyway.
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct().cache()
    val deg = und.select(col("u").as("id"))
      .unionAll(und.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val wd = und
      .join(deg.select(col("id").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), Seq("v"))
    val uFirst = ordLt(col("du"), col("u"), col("dv"), col("v"))
    // oriented edge (a -> b) with b's degree kept for wedge ordering
    val oriented = wd.select(
      when(uFirst, col("u")).otherwise(col("v")).as("a"),
      when(uFirst, col("v")).otherwise(col("u")).as("b"),
      when(uFirst, col("dv")).otherwise(col("du")).as("db"))
    val e1 = oriented.select(col("a"), col("b").as("x"), col("db").as("dx"))
    val e2 = oriented.select(col("a"), col("b").as("y"), col("db").as("dy"))
    val wedges = e1.join(e2, Seq("a"))
      .filter(ordLt(col("dx"), col("x"), col("dy"), col("y")))
      .select(col("a"), col("x"), col("y"))
    val tri = wedges.join(
      oriented.select(col("a").as("x"), col("b").as("y")), Seq("x", "y"))
    // one evaluation of the triangle join — explode, not a 3-way union
    // whose branches would each recompute it
    tri.select(explode(array(col("a"), col("x"), col("y"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
  }
}
