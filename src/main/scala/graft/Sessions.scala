package graft

import org.apache.spark.sql.SparkSession

/** Shared session construction so Verify/Bench/tests agree on the confs
  * that affect correctness and local performance.
  */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // AQE plans each shuffle at 8x the target parallelism and
      // COALESCES down to size (coalescePartitions is on by default),
      // so partition count scales with data volume instead of being
      // pinned at the core count: at sf10 (60M-row lineitem) a fixed
      // 32 meant ~2M-row sort partitions — spill territory — while at
      // sf0.01 AQE still coalesces to a handful. This is the same knob
      // a 1000-executor deployment sets (initialPartitionNum high,
      // advisory size governs), measured at the sf10 decade in
      // SCALING.md.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (shufflePartitions * 8).toString)
      // keep catalog/warehouse state out of the repo root
      .config("spark.sql.warehouse.dir",
        sys.env.getOrElse("GRAFT_WAREHOUSE_DIR",
          "/root/repo/target/spark-warehouse"))
      // testdata events.parquet carries TIMESTAMP(NANOS); read as long
      // and convert in graft.sources.Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
}
