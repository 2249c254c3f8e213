package graft.sources

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class LakeCompactSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def parquetFiles(dir: String, day: String = "") = {
    val it = Files.walk(java.nio.file.Paths.get(dir))
    try it.filter(p => p.toString.endsWith(".parquet") &&
      p.toString.contains(day)).count()
    finally it.close()
  }

  /** events lake, many small files per day (simulated micro-batches). */
  private def fragmentedLake(): String = {
    val dir = Files.createTempDirectory("graft_compact").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .repartition(16).withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    dir
  }

  test("compaction rewrites ONLY fragmented days; others physically untouched") {
    val dir = fragmentedLake()
    // make one day already-compact: rewrite it to a single file in place
    val days = fs.listStatus(new Path(dir)).map(_.getPath.getName)
      .filter(_.startsWith("day=")).sorted
    val compactDay = days.head
    val single = spark.read.parquet(s"$dir/$compactDay").coalesce(1)
    val tmp = dir + "/.setup_tmp"
    single.write.mode("overwrite").parquet(tmp)
    fs.delete(new Path(s"$dir/$compactDay"), true)
    fs.rename(new Path(tmp), new Path(s"$dir/$compactDay"))

    val untouchedBefore = fs.listStatus(new Path(s"$dir/$compactDay"))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(f => (f.getPath.getName, f.getModificationTime)).toSeq.sorted
    val rows = spark.read.parquet(dir).count()
    val before = parquetFiles(dir)

    // huge per-file target => every multi-file day collapses to 1 file
    val compacted = Lake.compact(spark, dir, targetBytesPerFile = 1L << 40)

    assert(!compacted.contains(compactDay), "already-compact day rewritten")
    assert(compacted.toSet == days.tail.toSet, "all fragmented days compacted")
    // the untouched day's files are PHYSICALLY the same (name + mtime)
    val untouchedAfter = fs.listStatus(new Path(s"$dir/$compactDay"))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(f => (f.getPath.getName, f.getModificationTime)).toSeq.sorted
    assert(untouchedAfter == untouchedBefore)
    // fragmented days are now single-file; data and layout survive
    days.tail.foreach(d => assert(parquetFiles(dir, d) == 1L, s"$d"))
    assert(parquetFiles(dir) < before)
    val after = spark.read.parquet(dir)
    assert(after.count() == rows)
    assert(after.columns.contains("day"))
    // pruning still works post-compaction
    val f = after.filter(col("day") === "2024-01-03")
    f.collect()
    assert(f.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }

  test("second compact run is a no-op (idempotent selection)") {
    val dir = fragmentedLake()
    val first = Lake.compact(spark, dir, targetBytesPerFile = 1L << 40)
    assert(first.nonEmpty)
    val second = Lake.compact(spark, dir, targetBytesPerFile = 1L << 40)
    assert(second.isEmpty, s"re-compacted: $second")
  }

  test("compact refuses a streaming-sink lake (_spark_metadata present)") {
    val dir = fragmentedLake()
    fs.mkdirs(new Path(s"$dir/_spark_metadata"))
    val e = intercept[IllegalArgumentException] {
      Lake.compact(spark, dir, targetBytesPerFile = 1L << 40)
    }
    assert(e.getMessage.contains("_spark_metadata"))
    // nothing was touched
    assert(parquetFiles(dir) > 0)
  }

  test("interrupted swap recovers: lost day restored, leftovers cleared") {
    val dir = fragmentedLake()
    val rows = spark.read.parquet(dir).count()
    val days = fs.listStatus(new Path(dir)).map(_.getPath.getName)
      .filter(_.startsWith("day=")).sorted
    val victim = days.head
    // simulate a crash between the two renames: day gone, old copy left
    fs.rename(new Path(s"$dir/$victim"), new Path(s"$dir/.compact_old_$victim"))
    // plus a stale partial rewrite and a completed-swap leftover
    fs.mkdirs(new Path(s"$dir/.compact_tmp_${days(1)}"))
    fs.mkdirs(new Path(s"$dir/.compact_old_${days(2)}"))

    Lake.compact(spark, dir, targetBytesPerFile = 1L << 40)

    val names = fs.listStatus(new Path(dir)).map(_.getPath.getName).toSet
    assert(names.contains(victim), "lost day not restored")
    assert(!names.exists(_.startsWith(".compact_")), s"leftovers: $names")
    assert(spark.read.parquet(dir).count() == rows, "rows lost in recovery")
  }
}
