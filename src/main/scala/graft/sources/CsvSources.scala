package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV scan + sink (SURVEY §2.1 S4/S5).
  *
  * Reference: `pd.read_csv` (`ETL Scripts/transform_running_data.py:35`)
  * reads header CSVs where `--` sentinels and `"1,234"` thousands-comma
  * numbers SURVIVE as strings; cleanup happens downstream (F16/F17).
  * `df.to_csv(path, index=False)` (`transform_running_data.py:248`) writes
  * the Power-BI-facing finals.
  *
  * Scan policy: dirty numeric columns are declared as StringType in the
  * caller's schema so sentinels survive exactly as pandas' object dtype
  * keeps them; schema inference is never used (same rationale as
  * JsonSources). The quoted-field parsing (`"9,876"`) is univocity's
  * default double-quote handling.
  *
  * Sink policy: `coalesce(1)` matches the reference's one-file-per-table
  * contract and is acceptable ONLY for small presentation outputs (the
  * PBI finals are hundreds of rows); large extracts keep their natural
  * partitioning (no coalesce) — callers choose via `singleFile`.
  */
object CsvSources {

  /** S4 — header CSV scan with explicit schema; sentinels survive. */
  def scan(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .schema(schema)
      .csv(path)

  /** S5 — header CSV write. Returns the directory written. */
  def write(df: DataFrame, dir: String, singleFile: Boolean = true): String = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true").csv(dir)
    dir
  }
}
