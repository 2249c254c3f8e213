package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spectral embedding analysis: dominant principal direction via power
  * iteration, fully distributed and engine-replayable.
  *
  * An LLM-data pipeline uses the top singular direction of the
  * embedding matrix for de-biasing (all-but-the-top post-processing),
  * drift monitoring between corpus snapshots, and as the split axis of
  * spill-free balanced KD-style sharding. The dense d×d covariance
  * never materializes: each iteration is two matrix-free passes —
  * `dot_i = x_i · v` (a map over rows), then `s_j = Σ_i x_ij · dot_i`
  * (one aggregation keyed by DIMENSION, so state is O(d) per task).
  *
  * Determinism contract (the same ordered-fold discipline as the PQ
  * ADC scorer): every floating-point reduction folds in an explicit
  * total order — row dots in index order, per-dimension sums in
  * `vec_id` order, the norm in dimension order — so two engines
  * produce bit-identical loadings. The start vector is the constant
  * 1/√d with d a power of four (0.125 for d=64 — an exact binary
  * fraction). At production scale the per-dimension fold would relax
  * to a commutative `sum()` (order-free, faster) at the cost of
  * run-to-run last-ulp drift; the operator keeps the ordered fold
  * because its cost is one small sort per dimension group.
  *
  * Scale shape: the long form shuffles n·d (row, dim, value) triples
  * once per iteration, grouped into d dimension keys — dimensions
  * spread across tasks, no task ever holds the matrix. The
  * loop-invariant frames (row arrays + long form) are cached so
  * iteration t doesn't recompute the explode t times (the PageRank
  * lesson); Verify/Bench clearCache() between queries.
  */
object Spectral {

  /** One row per dimension: `dim` (1-based), `loading` (component of
    * the dominant direction after `iters` power iterations), `eig`
    * (the final Rayleigh-style estimate ‖XᵀX v‖ of the top eigenvalue
    * of XᵀX, constant across rows).
    */
  def powerIterationLoadings(df: DataFrame, idCol: String, vecCol: String,
                             dim: Int, iters: Int): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val invSqrtD = 1.0 / math.sqrt(dim.toDouble)
    require(invSqrtD * invSqrtD * dim == 1.0,
      s"dim must be a power of 4 so 1/sqrt(dim) is exact, got $dim")

    val id = col(idCol)
    // row arrays (double) + long form, cached across iterations
    val rows = df.select(id, transform(col(vecCol),
      x => x.cast("double")).as("xd")).cache()
    val long = df.select(id, posexplode(col(vecCol)))
      .select(id, (col("pos") + 1).cast("long").as("j"),
        col("col").cast("double").as("x")).cache()

    def orderedSum(ordCol: String, valueExpr: Column): Column =
      aggregate(
        transform(array_sort(collect_list(struct(col(ordCol),
          valueExpr.as("__c")))), x => x.getField("__c")),
        lit(0.0), (a, x) => a + x)

    // s_j and the norm for the CURRENT direction; vArr = None means the
    // constant 1/sqrt(d) start vector (avoids a join on iteration 1).
    def step(vArr: Option[DataFrame]): (DataFrame, DataFrame) = {
      val dots = vArr match {
        case None =>
          rows.select(id, aggregate(col("xd"), lit(0.0),
            (a, x) => a + x * lit(invSqrtD)).as("d"))
        case Some(v) =>
          rows.crossJoin(broadcast(v)).select(id,
            aggregate(zip_with(col("xd"), col("vl"), (x, y) => x * y),
              lit(0.0), (a, x) => a + x).as("d"))
      }
      val s = long.join(dots, Seq(idCol))
        .groupBy(col("j"))
        .agg(orderedSum(idCol, col("x") * col("d")).as("sv"))
      val nrm = s.agg(sqrt(aggregate(
        transform(array_sort(collect_list(struct(col("j"),
          col("sv").as("__s")))), x => x.getField("__s")),
        lit(0.0), (a, x) => a + x * x)).as("nrm"))
      (s, nrm)
    }

    var (s, nrm) = step(None)
    for (_ <- 2 to iters) {
      val vArr = s.crossJoin(broadcast(nrm))
        .select(col("j"), (col("sv") / col("nrm")).as("v"))
        .agg(transform(array_sort(collect_list(struct(col("j"),
          col("v").as("__v")))), x => x.getField("__v")).as("vl"))
      val next = step(Some(vArr))
      s = next._1
      nrm = next._2
    }
    s.crossJoin(broadcast(nrm))
      .select(col("j").as("dim"), (col("sv") / col("nrm")).as("loading"),
        col("nrm").as("eig"))
      .orderBy(col("dim"))
  }
}
