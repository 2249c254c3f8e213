package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HashFns

/** Feature extraction for downstream model training. The hashing
  * trick (Weinberger et al. 2009, "Feature Hashing for Large Scale
  * Multitask Learning") maps an unbounded vocabulary into a fixed
  * bucket space with a SIGNED hash, so collisions cancel in
  * expectation instead of biasing the dot product — the standard way
  * to featurize corpus-scale text without a driver-side vocabulary
  * (no fit step, no dictionary broadcast, new tokens never invalidate
  * the model input shape).
  */
object Features {

  /** Signed hashing-trick bag-of-words: one input row per (id, token)
    * occurrence, output `(idCol, bucket, feat_val)` sparse rows where
    * `bucket = md5(token) mod nBuckets` and `feat_val` sums the ±1
    * signs (an independent seeded md5 bit) over the id's occurrences.
    * Zero-sum buckets (full cancellation) are dropped — they carry no
    * signal and a sparse representation must not store them.
    *
    * Both hashes are the engine-portable md5-derived longs
    * ([[HashFns.md5Long]]), so any engine reproduces the exact
    * feature matrix. Scale: map-only hashing then ONE
    * partial-aggregated groupBy on (id, bucket) — the shuffle carries
    * (id, bucket, partial sum), never token strings.
    */
  def hashingTrick(df: DataFrame, idCol: String, tokCol: String,
                   nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val bucket = (HashFns.md5Long(col(tokCol)) % nBuckets).as("bucket")
    val sign = (HashFns.md5Long(col(tokCol), 1) % 2 * 2 - 1).as("__s")
    df.select(col(idCol), bucket, sign)
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("__s")).as("feat_val"))
      .filter(col("feat_val") =!= 0)
  }

  /** DuckDB SQL fragments mirroring [[hashingTrick]]'s bucket and sign
    * for a token expression — kept adjacent so the sides can't drift.
    */
  def bucketSql(tokExpr: String, nBuckets: Int): String =
    s"(${HashFns.md5LongSql(tokExpr)}) % $nBuckets"

  def signSql(tokExpr: String): String =
    s"((${HashFns.md5LongSql(tokExpr, 1)}) % 2) * 2 - 1"
}
