package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.HashFns

/** Weighted sampling WITHOUT replacement by order sampling —
  * sequential Poisson sampling (Ohlsson 1998, the πps order-sampling
  * design used in official statistics): every row draws the
  * deterministic uniform u = (md5(seed:id) + 1) / 2^60 and the n rows
  * with the SMALLEST u/w win, so inclusion probability is
  * approximately n·w/Σw (probability proportional to size).
  *
  * Why u/w and not Efraimidis–Spirakis' u^(1/w) / −ln(u)/w keys: those
  * need libm (`pow`/`ln`), whose last-ulp differences across engines
  * would hang SELECTION BOUNDARIES on library implementations (the
  * same reason q_sample_mixture's quota fill uses raw hash order). The
  * u/w key is one integer-derived IEEE division — bit-identical in
  * every engine, so the sampled SET is exactly reproducible, which is
  * what corpus curation needs from a sampler (stable slices, exact
  * replay audits).
  *
  * 100 TB shape: the key is map-side codegen'd arithmetic, selection
  * is a global top-n (TakeOrdered: per-partition heaps, driver merges
  * n rows per partition) — no shuffle of the corpus, no rand()
  * (partitioning-dependent) anywhere.
  */
object Sampling {

  /** The n smallest u/w rows of `df` (weights must be positive;
    * non-positive-weight rows are excluded). Ties break on `idCol`.
    * Output keeps `df`'s columns, ordered by `idCol`.
    */
  def sequentialPoisson(df: DataFrame, idCol: String, weightCol: String,
                        n: Int, seed: Int): DataFrame = {
    val u = (HashFns.md5Long(col(idCol).cast("string"), seed) + lit(1L))
      .cast("double") / lit(math.pow(2, 60))
    val k = Dedup.freshName(df, "__k") // never clobber a caller column
    df.filter(col(weightCol) > 0)
      .withColumn(k, u / col(weightCol))
      .orderBy(col(k), col(idCol))
      .limit(n)
      .drop(k)
      .orderBy(col(idCol))
  }

  /** Greedy k-center (farthest-point) diversity selection over an
    * embedding column — the coverage-maximizing subset picker corpus
    * curation uses to seed diverse training slices (Sener & Savarese
    * 2018's coreset rule): start from the smallest id, then repeatedly
    * take the point FARTHEST from everything selected so far. The
    * selection radius (`dist`, each pick's squared distance to the
    * prior centers) is the k-center coverage bound, reported per round.
    *
    * Determinism contract: distances are Σ(aᵢ−bᵢ)² folded in index
    * order (the engine-parity convention of the dot-product family),
    * argmax ties break on the smaller id — so the selected SET is
    * bit-reproducible across engines and partitionings, which is what
    * a replayable curation audit needs.
    *
    * 100 TB shape: each of the k rounds is one map-side distance
    * update against the SINGLE broadcast new center plus one
    * TakeOrdered(1) (per-partition max, driver merges one row per
    * partition) — the corpus is never shuffled, and the running
    * min-distance frame is cached per round (at cluster scale,
    * checkpoint instead to truncate the k-deep lineage).
    */
  def kCenter(df: DataFrame, idCol: String, vecCol: String,
              k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    def dist2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) =>
          (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => acc + v)
    var picks = df.orderBy(col(idCol)).limit(1)
      .select(lit(1L).as("round"), col(idCol).as("center_id"),
        col(vecCol).as("__cv"), lit(0.0).as("dist"))
    var dmin = df.crossJoin(broadcast(picks.select(col("__cv"))))
      .select(col(idCol), col(vecCol),
        dist2(col(vecCol), col("__cv")).as("__dmin"))
      .cache()
    for (r <- 2 to k) {
      val next = dmin.orderBy(col("__dmin").desc, col(idCol)).limit(1)
        .select(lit(r.toLong).as("round"), col(idCol).as("center_id"),
          col(vecCol).as("__cv"), col("__dmin").as("dist"))
      picks = picks.unionAll(next)
      dmin = dmin.crossJoin(broadcast(next.select(col("__cv").as("__nv"))))
        .select(col(idCol), col(vecCol),
          least(col("__dmin"), dist2(col(vecCol), col("__nv")))
            .as("__dmin"))
        .cache()
    }
    picks.select(col("round"), col("center_id"), col("dist"))
      .orderBy(col("round"))
  }
}
