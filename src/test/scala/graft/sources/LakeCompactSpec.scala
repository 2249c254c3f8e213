package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class LakeCompactSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("compaction shrinks file count, keeps rows and partition layout") {
    val dir = Files.createTempDirectory("graft_compact").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    // simulate micro-batch ingest: many small files per day
    ev.repartition(16).withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    def parquetFiles = {
      val it = Files.walk(java.nio.file.Paths.get(dir))
      try it.filter(_.toString.endsWith(".parquet")).count()
      finally it.close()
    }
    val before = parquetFiles
    val rows = spark.read.parquet(dir).count()
    Lake.compact(spark, dir, targetRowsPerFile = rows)
    assert(parquetFiles < before)
    val after = spark.read.parquet(dir)
    assert(after.count() == rows)
    assert(after.columns.contains("day"))
    // pruning still works post-compaction
    val f = after.filter(col("day") === "2024-01-03")
    f.collect()
    assert(f.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }
}
