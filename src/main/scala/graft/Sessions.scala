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
      // keep catalog/warehouse state out of the repo root
      .config("spark.sql.warehouse.dir",
        sys.env.getOrElse("GRAFT_WAREHOUSE_DIR",
          "/root/repo/target/spark-warehouse"))
      // testdata events.parquet carries TIMESTAMP(NANOS); read as long
      // and convert in graft.sources.Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
}
