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
}
