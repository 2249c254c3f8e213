package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical lake layout (SURVEY §7.4#8): parquet partitioned by day.
  *
  * The reference's interchange format is loose CSV/JSON; at 100 TB the
  * engine-facing format is parquet with hive-style `day=YYYY-MM-DD`
  * directories so date predicates become PARTITION PRUNING (the scan
  * never lists, let alone reads, out-of-range days — `PartitionFilters`
  * in the plan, asserted by LakeSpec). JDBC/CSV remain edge sinks.
  */
object Lake {

  /** Write `df` partitioned by the date of `tsCol` (adds a `day`
    * partition column). No coalesce: each day keeps the natural task
    * parallelism; small-file compaction is a separate maintenance pass.
    */
  def writeByDay(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("day", to_date(col(tsCol)))
      .write.mode("overwrite")
      .partitionBy("day")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
