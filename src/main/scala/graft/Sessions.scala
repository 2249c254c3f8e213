package graft

import org.apache.spark.sql.SparkSession

/** Shared session construction so Verify/Bench/tests agree on the confs
  * that affect correctness and local performance.
  */
object Sessions {

  /** Shuffle-width factor from INPUT VOLUME (round 12, closing the r11
    * "manual dial" finding): a deployment wants initialPartitionNum to
    * follow the dataset, not an env var someone remembered to set. The
    * heuristic targets ~8 MB of COMPRESSED input per planned partition
    * per core-multiple — calibrated from the sf10 experiment, where
    * 2.2 GB of parquet wanted width 256 on 32 cores (factor 8: SMJ
    * sorts stop spilling at ~2M rows/partition; star_revenue
    * 27.8 → 9.5 s) while sf1's 222 MB and below want factor 1 (the
    * wide width REGRESSED ~20 cached/iterative mid-size queries at
    * sf0.1 — cached lineages materialize at the pre-coalesce width).
    * 8 MB compressed ≈ the 64 MB-uncompressed advisory partition on
    * this data (the closed-vocab synthetic compresses ~8×). So:
    * factor = clamp(round(bytes / (8 MB × cores)), 1, 16) — 1 for
    * every local test/correctness SF (bit-for-bit the old default; the
    * oracle harness is order-deterministic anyway), 8 at the sf10
    * decade, capped at 16. SPARK_GRAFT_AQE_WIDTH_FACTOR overrides
    * numerically for experiments; unreadable dirs fall back to 1.
    */
  private[graft] def autoWidthFactor(dir: String, cores: Int): Int = {
    val bytes =
      try {
        val d = new java.io.File(dir)
        if (!d.isDirectory) 0L
        else d.listFiles().filter(_.isFile).map(_.length).sum
      } catch { case _: Throwable => 0L }
    val f = math.round(bytes.toDouble / (8_000_000.0 * cores))
    math.max(1L, math.min(16L, f)).toInt
  }

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    builder(master, shufflePartitions, None)

  /** `dataDir`: the input directory the session will mostly scan, for
    * [[autoWidthFactor]] — Verify passes its CLI arg (its sfDir is not
    * in the env), Bench/tests fall back to SPARK_GRAFT_SF_DIR.
    */
  def builder(master: String, shufflePartitions: Int,
              dataDir: Option[String]): SparkSession.Builder = {
    val widthFactor = sys.env.get("SPARK_GRAFT_AQE_WIDTH_FACTOR")
      .map(_.toInt)
      .getOrElse(autoWidthFactor(
        dataDir.orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
          .getOrElse("/root/testdata/sf0.1"),
        shufflePartitions))
    // One observable line per session build: the dial must be
    // auditable from any run's log (the sf10 width A/B was
    // un-debuggable without it).
    Console.err.println(
      s"[graft] AQE width factor $widthFactor " +
        s"(initialPartitionNum ${shufflePartitions * widthFactor})")
    SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // Shuffle-width dial: AQE plans each shuffle at FACTOR x the
      // target parallelism and coalesces down by advisory size, so
      // partition count can follow data volume instead of the core
      // count. Factor 8 at the sf10 decade cut the shuffle-bound
      // heavies 1.7-2.9x (60M-row SMJ sorts stop spilling at ~2M rows
      // per partition) — but at sf0.1 the same width REGRESSED ~20
      // mid-size queries with tight spreads (cached/iterative plans
      // materialize at the wide pre-coalesce width and repay its task
      // overhead every iteration). The factor now AUTO-SIZES from the
      // input directory's bytes ([[autoWidthFactor]]): 1 at every
      // local correctness SF, 8 at the sf10 decade, env-overridable.
      // Both underlying measurements in SCALING.md.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (shufflePartitions * widthFactor).toString)
      // keep catalog/warehouse state out of the repo root
      .config("spark.sql.warehouse.dir",
        sys.env.getOrElse("GRAFT_WAREHOUSE_DIR",
          "/root/repo/target/spark-warehouse"))
      // testdata events.parquet carries TIMESTAMP(NANOS); read as long
      // and convert in graft.sources.Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
  }
}
