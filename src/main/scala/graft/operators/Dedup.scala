package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic deduplication (SURVEY §2.8 U2, §2.5 A10/A11).
  *
  * Reference: `ETL Scripts/transform_all_datasets.py:184-186,211-213,...`
  * — pandas `sort_values(...)` then `drop_duplicates(subset, keep='first')`.
  *
  * Spark's `dropDuplicates` keeps an ARBITRARY row per key (whichever
  * partition wins), so it cannot reproduce keep-first-after-sort
  * semantics; we use a ranking window with an explicit total order
  * instead. At scale this is one hash shuffle on the key columns and the
  * per-key sort is tiny; AQE handles skewed keys.
  */
object Dedup {

  /** Helper-column name guaranteed absent from `taken` (a fixed name
    * would silently shadow a same-named input column and corrupt
    * results). Operators that add helper columns to MULTIPLE frames
    * must pass the union of all frames' columns.
    */
  private[operators] def freshName(taken: Set[String], base: String): String =
    Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
      .find(!taken(_)).get

  private[operators] def freshName(df: DataFrame, base: String): String =
    freshName(df.columns.toSet, base)

  /** Keep the first row per key under `order` (must be a total order —
    * include a tiebreaker column for determinism).
    */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w  = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val rn = freshName(df, "__rn")
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(rn)
  }

  /** Keep the row with the max `ordCol` per key (argmax dedup, A10).
    * Single-pass `max_by(struct(*), ord)` alternative is available, but a
    * window keeps ties deterministic via explicit tiebreakers.
    */
  def keepLatest(df: DataFrame, keys: Seq[String], ordCol: Column,
                 tiebreak: Seq[Column] = Nil): DataFrame =
    keepFirst(df, keys, ordCol.desc +: tiebreak)

  /** Exact-duplicate removal by content hash: one shuffle on the digest,
    * keeps the row with the smallest id per identical content
    * (scale path for 100 TB corpora: the shuffle key is the 128-bit
    * digest, not the document body).
    */
  def exactByContent(df: DataFrame, contentCol: String, idCol: String): DataFrame = {
    val fp = freshName(df, "__fp")
    keepFirst(df.withColumn(fp, md5(col(contentCol))),
      Seq(fp), Seq(col(idCol))).drop(fp)
  }
}
