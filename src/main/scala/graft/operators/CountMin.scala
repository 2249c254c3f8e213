package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.HashFns

/** Count-min sketch: fixed-size frequency estimation — the frequency
  * sibling of the HLL distinct-count certification
  * (q_profile_approx_distinct). A d×w grid of counters where every
  * item increments one cell per row (bucket = family-hash mod w);
  * `estimate(x) = min over rows of cell[d][h_d(x)]` is never below the
  * true count and overshoots only by colliding keys' mass (one-sided
  * ε ≈ e/w error with probability 1 − e^−d).
  *
  * 100 TB shape: the sketch build is ONE partial-aggregated groupBy
  * over (d, bucket) — the shuffle carries at most d×w counter rows per
  * map task regardless of corpus size or key cardinality, and sketches
  * merge by cell-wise addition (exactly what Spark's partial
  * aggregation does), so the same operator serves batch, incremental
  * union, and streaming state. Estimation probes broadcast the d×w
  * table. Hashes are the md5-derived engine-portable family (HashFns),
  * so a DuckDB oracle replays every cell and estimate bit-exactly.
  */
object CountMin {

  /** Build the sketch over `items(itemCol)`: one (d, bucket, c) row per
    * non-empty cell (c = exact cell count; zero cells are implicit).
    */
  def sketch(items: DataFrame, itemCol: String,
             depth: Int, width: Int): DataFrame =
    items.select(posexplode(buckets(itemCol, depth, width)).as(Seq("d", "bucket")))
      .groupBy(col("d"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Count-min estimates for `keys(itemCol)` (distinct keys): joins the
    * broadcast sketch on (d, bucket) and takes the per-key min. Keys
    * whose cells are all absent from the sketch were never inserted —
    * an inner join drops them (estimate 0 by convention).
    */
  def estimate(keys: DataFrame, itemCol: String, sk: DataFrame,
               depth: Int, width: Int): DataFrame = {
    // probe under fresh names so a caller column named d/bucket/c can
    // neither collide in the join nor be grouped/aggregated by mistake
    val d = Dedup.freshName(keys, "__cm_d")
    val b = Dedup.freshName(keys, "__cm_bucket")
    val cv = Dedup.freshName(keys, "__cm_c")
    keys.select(col("*"),
        posexplode(buckets(itemCol, depth, width)).as(Seq(d, b)))
      .join(broadcast(sk.select(col("d").as(d), col("bucket").as(b),
        col("c").as(cv))), Seq(d, b))
      .groupBy(keys.columns.map(col).toIndexedSeq: _*)
      .agg(min(col(cv)).as("cm_estimate"))
  }

  /** Mergeable COUNT-MIN CATALOG (the lifecycle face of [[sketch]],
    * completing the catalog trilogy: HLL distincts —
    * Profile.distinctSketchCatalog; KMV set operations —
    * KMV.sketchCatalog; this — frequencies): one d×w counter grid per
    * day PERSISTED to `catalogDir` with dynamic partition overwrite,
    * so a new day's rows rewrite only that day's partition and history
    * is never re-scanned. Count-min merges by CELL-WISE ADDITION, so
    * any cross-period frequency question ("how often did key x appear
    * this quarter") is answered by summing the stored grids —
    * days × d × w tiny rows however big the underlying data — and
    * probing the merged grid.
    *
    * `catalogDir` MUST be dataset-scoped by the caller (the
    * QueriesSources.dsScoped contract): dynamic overwrite preserves
    * partitions absent from the current input — right for incremental
    * maintenance, wrong across datasets sharing a directory (the r13
    * hll_catalog red row; pinned by InfraSpec's cross-dataset
    * idempotence test).
    *
    * Report: the true top-`probeK` keys by exact count (the test-scale
    * certification baseline, the [[sketch]] convention), each probed
    * against the MERGED STORED grid — (n_days, key, exact_n,
    * cm_estimate, over_count). Cell counts are integers and hashes the
    * md5 family, so every column replays bit-exactly in DuckDB;
    * n_days comes from the catalog read-back, so a polluted directory
    * fails the hash gate loudly.
    */
  def sketchCatalog(df: DataFrame, dayCol: org.apache.spark.sql.Column,
                    itemCol: String, depth: Int, width: Int,
                    probeK: Int, catalogDir: String): DataFrame = {
    val items = df.filter(col(itemCol).isNotNull)
    val daily = items
      .select(dayCol.as("day"),
        posexplode(buckets(itemCol, depth, width)).as(Seq("d", "bucket")))
      .groupBy(col("day"), col("d"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    daily.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day")
      .parquet(catalogDir)
    // A catalog nothing has ever written into is a VALID state (the
    // readKmvSketch/readMgSummary convention, r14 advice): an empty
    // first input leaves a partition-less dir that read.parquet would
    // reject with a schema-inference error instead of reporting "no
    // days yet". Probe the dir for day partitions before reading.
    if (!catalogHasDays(df, catalogDir))
      return df.sparkSession.range(0).select(
        lit(0L).as("n_days"), lit("").as("key"), lit(0L).as("exact_n"),
        lit(0L).as("cm_estimate"), lit(0L).as("over_count"))
    val catalog = df.sparkSession.read.parquet(catalogDir)
    // cell-wise addition of the per-day grids = the whole-period grid
    val merged = catalog.groupBy(col("d"), col("bucket"))
      .agg(sum(col("c")).as("c"))
    val nDays = catalog.agg(count_distinct(col("day")).as("n_days"))
    val top = items.groupBy(col(itemCol).as("key"))
      .agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("key")).limit(probeK)
    estimate(top, "key", merged, depth, width)
      .crossJoin(broadcast(nDays))
      .select(col("n_days"), col("key"), col("exact_n"),
        col("cm_estimate"),
        (col("cm_estimate") - col("exact_n")).as("over_count"))
      .orderBy(col("exact_n").desc, col("key"))
  }

  /** Whether `catalogDir` holds at least one day partition — the guard
    * every partitionBy("day") catalog builder runs between its write
    * and its read-back, so an empty first input yields the builder's
    * empty report instead of a parquet schema-inference error (shared
    * by the HLL/KMV/CM/histogram catalogs).
    */
  private[operators] def catalogHasDays(df: DataFrame,
                                        catalogDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(catalogDir)
    val fs = p.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("day="))
  }

  /** The d bucket positions of one item: family-hash i of the item's
    * md5-long, mod `width` (family hashes are non-negative, so `%` is
    * portable across engines without pmod gymnastics).
    */
  private def buckets(itemCol: String, depth: Int, width: Int) =
    array((0 until depth).map(i =>
      (HashFns.hashFamily(HashFns.md5Long(col(itemCol)), i) % width)
        .cast("int")): _*)
}
