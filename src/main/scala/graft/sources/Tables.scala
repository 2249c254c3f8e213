package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see /root/repo/TESTDATA.md). One parquet file per table under
  * `sfDir`. Parquet scans give Catalyst pushdown + pruning for free;
  * at cluster scale the same call reads a partitioned directory, so
  * nothing here assumes single-file layout.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * only reads via spark.sql.legacy.parquet.nanosAsLong (as a raw long).
    * Convert to a microsecond TimestampType here (floor-truncate, matching
    * DuckDB's TIMESTAMP_NS -> TIMESTAMP cast) so downstream code sees a
    * normal timestamp column. Sessions must set the nanosAsLong conf
    * (graft.Sessions does).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType =>
        // Floor division in pure INTEGER math: `div` truncates toward zero
        // (wrong for pre-epoch negative nanos), and floor(x/1000.0) loses
        // precision because epoch nanos (~1.7e18) exceed double's 53-bit
        // mantissa. Subtracting pmod first keeps it exact and floor-like.
        raw.withColumn("ts",
          timestamp_micros(expr("(ts - pmod(ts, 1000L)) div 1000L")))
      case TimestampNTZType =>
        // TIMESTAMP(MICROS, isAdjustedToUTC=false) parquet surfaces as
        // NTZ in Spark 4, which unix_micros()/window() reject. The
        // session timezone is pinned to UTC (graft.Sessions), so the
        // LTZ relabel below is exact — the same micros DuckDB reads
        // from this file as its naive TIMESTAMP.
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
