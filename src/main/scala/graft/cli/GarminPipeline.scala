package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Sessions
import graft.datasets._

/** E1-style orchestrator (`ETL Scripts/etl_pipeline.py:53-223` semantics):
  * run every dataset pipeline, land each as parquet (the lake-format
  * sink; JDBC via graft.sinks.Jdbc is the edge sink), verify row counts,
  * isolate failures per dataset, report a summary.
  *
  * Unlike the reference's sequential eager loop, each dataset is ONE lazy
  * plan — Catalyst optimizes scan→transform→sink end to end, and the only
  * materialization is the sink write itself.
  *
  * Usage: runMain graft.cli.GarminPipeline <outDir> [rawDir]
  */
object GarminPipeline {

  final case class Result(dataset: String, rows: Long, error: Option[String])

  def datasets(spark: SparkSession,
               rawDir: String): Seq[(String, () => DataFrame)] = Seq(
    "summarized_activities" -> (() => ActivitiesPipeline.all(spark, rawDir)),
    "running_data"      -> (() => ActivitiesPipeline.running(spark, rawDir)),
    "sleep_data"        -> (() => SleepPipeline.clean(spark, rawDir)),
    "atl_data"          -> (() => MetricsPipelines.atl(spark, rawDir)),
    "maxmet_data"       -> (() => MetricsPipelines.maxmet(spark, rawDir)),
    "race_predictions"  -> (() => MetricsPipelines.racePredictions(spark, rawDir)),
    "training_history"  -> (() => MetricsPipelines.trainingHistory(spark, rawDir)),
    "uds_data"          -> (() => UdsPipeline.clean(spark, rawDir)),
    "training_plan"     -> (() => RunningPipeline.trainingPlan(spark)),
    "master_table"      -> (() => MasterTable.build(spark, rawDir)))

  def run(spark: SparkSession, outDir: String, rawDir: String): Seq[Result] =
    datasets(spark, rawDir).map { case (name, mk) =>
      try {
        val out = s"$outDir/$name"
        mk().write.mode("overwrite").parquet(out)
        // S7-style post-load verification against the landed sink.
        val n = spark.read.parquet(out).count()
        Result(name, n, None)
      } catch {
        case e: Throwable => Result(name, -1L, Some(e.toString.take(300)))
      }
    }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("target/tmp/garmin_out")
    val rawDir =
      if (args.length > 1) args(1) else GarminRaw.defaultRawDir
    val spark = Sessions.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = run(spark, outDir, rawDir)
    results.foreach { r =>
      println(f"[pipeline] ${r.dataset}%-18s rows=${r.rows}%6d ${r.error.getOrElse("OK")}")
    }
    val failed = results.count(_.error.nonEmpty)
    println(s"[pipeline] ${results.size - failed}/${results.size} datasets loaded")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
