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

  /** Bucketed table: hash-bucket rows by `key` into `buckets` files per
    * partition and record the bucketing in the catalog. Two tables
    * bucketed the SAME way join WITHOUT any exchange — the shuffle that
    * dominates large fact-fact joins is paid once at write time and
    * amortized over every subsequent join/aggregation on that key
    * (LakeBucketSpec asserts the exchange-free plan). This is the
    * co-location strategy for the master join and fact-fact joins at
    * 100 TB; `spark.sql.sources.bucketing.enabled` is on by default.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    // the in-memory catalog forgets tables across JVMs but their
    // warehouse directories survive — clear both before (re)creating
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + s"/$table")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

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
