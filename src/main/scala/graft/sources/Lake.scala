package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** 32-bit Morton (Z-order) interleave of two 16-bit dimension
    * values — the multi-dimensional clustering key behind lake Z-ORDER
    * layout (Delta/Iceberg's OPTIMIZE ZORDER BY): sorting by `zValue`
    * co-clusters rows that are close in BOTH dimensions, so per-file
    * min/max stats prune scans filtered on EITHER column, where a
    * lexicographic sort only skips on the leading one.
    *
    * Inputs are masked to 16 bits — at real scale callers rank-reduce
    * each dimension to its 16-bit bucket first (equi-depth bin id,
    * epoch-hour, grid cell). The spread is the magic-number shift-mask
    * cascade (5 exact integer ops per dimension, codegen'd, and
    * mirrored operation-for-operation by the DuckDB oracle in
    * q_lake_zorder).
    */
  def zValue(x: Column, y: Column): Column = {
    def spread(c: Column): Column = {
      val t0 = c.bitwiseAND(lit(0xFFFFL))
      val t1 = t0.bitwiseOR(shiftleft(t0, 8)).bitwiseAND(lit(0x00FF00FFL))
      val t2 = t1.bitwiseOR(shiftleft(t1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val t3 = t2.bitwiseOR(shiftleft(t2, 2)).bitwiseAND(lit(0x33333333L))
      t3.bitwiseOR(shiftleft(t3, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(x).bitwiseOR(shiftleft(spread(y), 1))
  }

  /** Z-ordered rewrite: range-partition by [[zValue]] into `nFiles`
    * files, each sorted by the z key — every file then covers one
    * compact z-range, i.e. a bounded rectangle in (x, y) space, and
    * parquet min/max footer stats skip files for predicates on either
    * dimension. Range boundaries come from Spark's reservoir sample
    * (layout-only nondeterminism: file CONTENTS bounds are what
    * skipping reads, and LakeZOrderSpec asserts the invariants —
    * disjoint per-file z-ranges, bounded per-file dimension spans).
    */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
                    path: String, nFiles: Int): Unit =
    df.withColumn("__z", zValue(col(xCol), col(yCol)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

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

  /** Compaction PACKING planner: first-fit-decreasing bin packing of
    * file (or partition) sizes into target-capacity output groups —
    * the grouping decision inside a small-file compaction pass
    * ([[compact]] rewrites days independently; this plans which inputs
    * COALESCE into which outputs when many small units must combine).
    *
    * FFD is inherently sequential, and that is fine AT SCALE because
    * its input is file METADATA — one row per file/partition, tiny by
    * construction however big the data is. The fold runs over one
    * collected array (size DESC, `ordCol` ASC — fully deterministic),
    * with the bin-load list as the accumulator; the DuckDB oracle
    * replays the identical fold via list_reduce with a list
    * accumulator, including the first-fit index arithmetic
    * (array_position's 0-when-absent convention matches DuckDB's
    * list_position exactly).
    *
    * `cap` = total size div `targetBins` (floor): an item larger than
    * cap opens its own (overfull) bin, the standard FFD behavior.
    * Output: one row per bin — `bin` (1-based, in creation order),
    * `load`, `cap`, `util` (= load/cap, one exact IEEE division).
    */
  def packPlan(items: DataFrame, sizeCol: String, ordCol: String,
               targetBins: Int): DataFrame = {
    require(targetBins >= 1, s"targetBins must be positive: $targetBins")
    val one = items.agg(
      transform(array_sort(collect_list(struct(
          (-col(sizeCol)).as("__k"), col(ordCol).as("__o"),
          col(sizeCol).as("__s")))),
        x => x.getField("__s")).as("__sizes"),
      expr(s"sum($sizeCol) div $targetBins").as("cap"))
    val loads = aggregate(col("__sizes"), array().cast("array<long>"),
      (acc, x) => {
        val fits = transform(acc, a => (a + x) <= col("cap"))
        val ip = array_position(fits, true) // 0 when nothing fits
        when(ip === 0, concat(acc, array(x)))
          .otherwise(concat(
            slice(acc, lit(1), (ip - 1).cast("int")),
            array(get(acc, (ip - 1).cast("int")) + x),
            slice(acc, (ip + 1).cast("int"),
              (size(acc) - ip).cast("int"))))
      })
    one.select(col("cap"), posexplode(loads.as("__loads")))
      .select((col("pos") + 1).cast("long").as("bin"),
        col("col").as("load"), col("cap"),
        (col("col").cast("double") / col("cap").cast("double"))
          .as("util"))
      .orderBy(col("bin"))
  }

  /** Range-partition PLANNER: balanced split points for laying a column
    * out as `k` sorted ranges (the boundary-sampling step inside
    * Spark's own RangePartitioner / a sorted-lake `partitionedBy` plan,
    * made deterministic and exact instead of sample-based).
    *
    * Boundaries are ORDER STATISTICS on a quantization GRID:
    * `grid(v) = floor(v)` buckets the column (the grid keeps the
    * histogram bounded regardless of row count — the same
    * bounded-domain contract as operators/Percentiles), boundary i is
    * the smallest grid value whose cumulative count reaches rank
    * ⌈i·n/k⌉, and a row's partition id is the number of boundaries
    * strictly below its grid value. All arithmetic is INTEGER (grid
    * values are longs, ranks are ceil-divided longs), so the plan is
    * bit-reproducible across engines and runs.
    *
    * Shape: one histogram shuffle (map-side combined, O(grid) rows), a
    * cumulative window over the HISTOGRAM (single-partition over the
    * grid, never the data — same contract as Percentiles), then a
    * broadcast of the (k-1)-element boundary array and a map-only
    * assignment + one summary aggregation.
    *
    * Output: one row per partition id — `pid`, `n_rows`, `lo`, `hi`
    * (observed grid min/max). Empty ranges (a hot grid value spanning
    * multiple ranks) simply don't appear.
    */
  def rangePartitionPlan(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, s"need at least 2 ranges, got $k")
    import org.apache.spark.sql.expressions.Window
    val vals = df.filter(col(valueCol).isNotNull)
      .select(floor(col(valueCol)).as("gv"))
    val hist = vals.groupBy(col("gv")).agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum", sum(col("c")).over(
      Window.orderBy(col("gv"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val n = vals.agg(count(lit(1)).as("n"))
    val ranks = n.select(explode(sequence(lit(1), lit(k - 1))).as("i"),
        col("n"))
      .withColumn("rank", expr(s"(i * n + ${k - 1}) div $k"))
    val bnd = cum.crossJoin(broadcast(ranks))
      .filter(col("cum") >= col("rank"))
      .groupBy(col("i")).agg(min(col("gv")).as("b"))
    val bnds = bnd.agg(sort_array(collect_list(col("b"))).as("bnds"))
    vals.crossJoin(broadcast(bnds))
      .select(col("gv"),
        size(filter(col("bnds"), b => b < col("gv"))).cast("long").as("pid"))
      .groupBy(col("pid"))
      .agg(count(lit(1)).as("n_rows"), min(col("gv")).as("lo"),
        max(col("gv")).as("hi"))
      .orderBy(col("pid"))
  }

  /** Small-file compaction, PARTITION-SELECTIVE: only `day=` directories
    * whose file count exceeds what their bytes need (> ceil(bytes /
    * targetBytesPerFile) files) are rewritten; every other day's files
    * are never read, written, or touched. Streaming/micro-batch ingest
    * leaves one file per batch per day; scans then pay per-file open
    * cost and the driver pays listing cost. Run as a maintenance pass
    * (the reference has no analogue — truncate-reload rewrote everything
    * every run). At 100 TB this is the difference between rewriting a
    * few fresh days and rewriting the lake: the r2 version read and
    * rewrote EVERYTHING to fix a handful of small-file days.
    *
    * Crash-safe swap, per day: the rewrite lands in
    * `.compact_tmp_day=X`, then `day=X` → `.compact_old_day=X`, tmp →
    * `day=X`, old deleted. Dot-prefixed names are invisible to Spark's
    * file listing and partition discovery, so readers never see a
    * half-state directory; a crash at any step leaves a recoverable
    * copy, and the next compact() run repairs it (restores a day whose
    * swap lost the race, clears completed-swap leftovers and stale
    * tmps). The only reader-visible window is between the two renames —
    * the day briefly lists as absent, never as corrupt.
    *
    * Returns the names of the compacted partitions (observability: a
    * maintenance pass that logs nothing reads as "did everything").
    */
  def compact(spark: SparkSession, path: String,
              targetBytesPerFile: Long = 128L << 20): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val root = new Path(path)
    // A lake written by the STREAMING file sink tracks its committed
    // files in _spark_metadata; renaming/deleting data files behind
    // that log would make every subsequent read fail on the vanished
    // files (readers use the log, not a directory listing, whenever it
    // exists). Refuse loudly rather than corrupt the lake.
    require(!fs.exists(new Path(root, "_spark_metadata")),
      s"$path is a streaming-sink lake (_spark_metadata present): " +
        "compact would invalidate the file-sink commit log. Retire the " +
        "stream's sink path (read + rewrite to a new batch lake) before " +
        "compacting.")
    recoverInterrupted(fs, root)
    val days = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("day="))
    val plans = days.flatMap { d =>
      val files = fs.listStatus(d.getPath).toSeq
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      val bytes = files.map(_.getLen).sum
      val want = math.max(1L,
        (bytes + targetBytesPerFile - 1) / targetBytesPerFile).toInt
      if (files.size > want) Some((d.getPath, want)) else None
    }
    plans.foreach { case (dayDir, want) =>
      val name = dayDir.getName
      val tmp = new Path(root, s".compact_tmp_$name")
      val old = new Path(root, s".compact_old_$name")
      spark.read.parquet(dayDir.toString)
        .repartition(want)
        .write.mode("overwrite").parquet(tmp.toString)
      fs.rename(dayDir, old)
      fs.rename(tmp, dayDir)
      fs.delete(old, true)
    }
    plans.map(_._1.getName)
  }

  /** Repair any interrupted compact() swap: a `.compact_old_day=X`
    * without its `day=X` is a swap that lost its second rename — restore
    * it; one WITH a live `day=X` is a completed swap whose cleanup
    * didn't run — delete it; `.compact_tmp_*` is a partial rewrite —
    * delete it (the source day is intact).
    */
  private def recoverInterrupted(fs: org.apache.hadoop.fs.FileSystem,
                                 root: org.apache.hadoop.fs.Path): Unit = {
    import org.apache.hadoop.fs.Path
    if (!fs.exists(root)) return
    fs.listStatus(root).foreach { s =>
      val n = s.getPath.getName
      if (n.startsWith(".compact_old_")) {
        val day = new Path(root, n.stripPrefix(".compact_old_"))
        if (fs.exists(day)) fs.delete(s.getPath, true)
        else fs.rename(s.getPath, day)
      } else if (n.startsWith(".compact_tmp_")) {
        fs.delete(s.getPath, true)
      }
    }
  }
}
