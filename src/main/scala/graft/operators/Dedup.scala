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
  * instead. At scale this is one hash shuffle on the key columns and
  * the per-key sort is tiny — but a pathologically hot key serializes
  * into ONE window task (AQE splits skewed join/aggregate partitions,
  * NOT window partitions). For skew-prone keys use [[keepFirstAgg]]:
  * a real partial aggregate with map-side combine, where the hot key
  * collapses to one candidate row per map task before the shuffle.
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

  /** [[keepFirst]] as an AGGREGATE: `min_by(struct(all cols),
    * struct(order cols))` — same answer (given the same total-order
    * contract; `min_by` is tie-arbitrary exactly where `row_number`
    * would be), different plan. The window form sorts each key's rows
    * in one task; this form is a DeclarativeAggregate, so map-side
    * combine reduces a hot key to one candidate row PER MAP TASK and
    * the shuffle carries one row per (task, key) — immune to the one
    * skewed dedup key that would serialize the window at 100 TB.
    * `order` must be plain ascending expressions (struct comparison is
    * lexicographic field-by-field, nulls-first like the window's
    * default); for descending semantics see [[keepLatestAgg]].
    */
  def keepFirstAgg(df: DataFrame, keys: Seq[String],
                   order: Seq[Column]): DataFrame = {
    val row = freshName(df, "__r")
    df.groupBy(keys.map(col): _*)
      .agg(min_by(struct(df.columns.map(col): _*), struct(order: _*)).as(row))
      .select(col(s"$row.*"))
  }

  /** [[keepLatest]] as an aggregate — `max_by` sibling of
    * [[keepFirstAgg]] (argmax dedup for skew-prone keys). Descending
    * tiebreakers can't ride in one `max_by` ordering struct, so the
    * tiebreak contract is: `ordCol` alone must be a total order per
    * key.
    */
  def keepLatestAgg(df: DataFrame, keys: Seq[String],
                    ordCol: Column): DataFrame = {
    val row = freshName(df, "__r")
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(df.columns.map(col): _*), ordCol).as(row))
      .select(col(s"$row.*"))
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
