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

  /** Small-file compaction: rewrite each `day=` partition into
    * ~`targetRowsPerFile` chunks. Streaming/micro-batch ingest leaves
    * one file per batch per day; scans then pay per-file open cost and
    * the driver pays listing cost. Run as a maintenance pass (the
    * reference has no analogue — truncate-reload rewrote everything
    * every run). `repartitionByRange` on the partition column + a
    * within-day spread keeps day-locality so partition pruning still
    * sees one directory per day.
    */
  def compact(spark: SparkSession, path: String,
              targetRowsPerFile: Long = 1000000L): Unit = {
    val df = spark.read.parquet(path)
    val rows = df.count()
    val files = math.max(1, (rows / targetRowsPerFile).toInt)
    val tmp = path.stripSuffix("/") + "__compacting"
    df.repartition(files, col("day"))
      .write.mode("overwrite").partitionBy("day").parquet(tmp)
    // atomic-ish swap (same filesystem)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val t = new org.apache.hadoop.fs.Path(tmp)
    fs.delete(p, true)
    fs.rename(t, p)
  }
}
