package graft.functions

import org.apache.spark.sql.DataFrame

/** F1 — column-header normalization (SURVEY §2.4 F1).
  *
  * Reference: `ETL Scripts/transform_all_datasets.py:51-52` and
  * `transform_running_data.py:53-54` — spaces become underscores and any
  * character outside `[A-Za-z0-9_]` is stripped from COLUMN NAMES.
  *
  * Pure metadata rename (a fold of `withColumnRenamed`) — no shuffle, no
  * data movement; Catalyst sees it as a projection alias.
  */
object Headers {

  def normalizeName(name: String): String =
    name.replace(" ", "_").replaceAll("[^A-Za-z0-9_]", "")

  def normalize(df: DataFrame): DataFrame =
    df.columns.foldLeft(df) { (d, c) =>
      val n = normalizeName(c)
      if (n == c) d else d.withColumnRenamed(c, n)
    }
}
