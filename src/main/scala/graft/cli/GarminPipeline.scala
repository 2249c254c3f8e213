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
  * CLI mirrors `etl_pipeline.py:226-275`:
  *
  *   runMain graft.cli.GarminPipeline [outDir] [rawDir]
  *     [--datasets a,b,c] [--config path.yaml]
  *
  * `--datasets` limits the run to the named pipelines (the reference's
  * `--datasets running_data sleep_data`, comma-joined here because sbt
  * runMain passes one argv). `--config` reads the reference's
  * `config.template.yaml:1-36` shape — a flat two-level YAML subset
  * parsed by [[PipelineConfig]]: `data_paths.raw_data`/`output_data`
  * supply the directories (explicit positional args win),
  * `tables:` renames each dataset's sink directory AND selects the
  * dataset set when no `--datasets` is given, and
  * `etl_settings.load_strategy` maps replace→overwrite, append→append
  * (upsert is the JDBC sink's job — graft.sinks.Jdbc.upsert).
  */
object GarminPipeline {

  final case class Result(dataset: String, rows: Long, error: Option[String])

  /** Parsed subset of the reference's config.yaml. */
  final case class PipelineConfig(
      rawDir: Option[String],
      outDir: Option[String],
      tables: Map[String, String],
      loadStrategy: String) {
    def saveMode: String = loadStrategy match {
      case "replace" => "overwrite"
      case "append"  => "append"
      case other => throw new IllegalArgumentException(
        s"unsupported load_strategy '$other' (replace|append)")
    }
  }

  object PipelineConfig {
    val default: PipelineConfig = PipelineConfig(None, None, Map.empty, "replace")

    /** Minimal parser for the flat section/key/value YAML shape of
      * `config.template.yaml` — top-level `section:` lines, indented
      * `key: value` pairs, `#` comments, optional quotes. No nesting
      * beyond two levels, no lists: that is all the reference file
      * uses, and a hand parser keeps the build dependency-free.
      */
    def parse(lines: Seq[String]): PipelineConfig = {
      var section = ""
      var raw, out: Option[String] = None
      var tables = Map.empty[String, String]
      var strategy = "replace"
      def unq(s: String): String = {
        val t = s.trim
        if (t.length >= 2 && (t.head == '"' || t.head == '\'') && t.last == t.head)
          t.substring(1, t.length - 1)
        else t
      }
      for (line0 <- lines) {
        val line = line0.takeWhile(_ != '#')
        if (line.trim.nonEmpty) {
          val indented = line.head == ' ' || line.head == '\t'
          line.trim.split(":", 2) match {
            case Array(k, v) if !indented && v.trim.isEmpty =>
              section = k.trim
            case Array(k, v) if indented =>
              (section, k.trim) match {
                case ("data_paths", "raw_data")    => raw = Some(unq(v))
                case ("data_paths", "output_data") => out = Some(unq(v))
                case ("tables", name)              => tables += name -> unq(v)
                case ("etl_settings", "load_strategy") => strategy = unq(v)
                case _ => () // unknown keys ignored, like the reference
              }
            case _ => ()
          }
        }
      }
      PipelineConfig(raw, out, tables, strategy)
    }

    def load(path: String): PipelineConfig = {
      val src = scala.io.Source.fromFile(path)
      try parse(src.getLines().toSeq) finally src.close()
    }
  }

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

  def run(spark: SparkSession, outDir: String, rawDir: String,
          select: Option[Seq[String]] = None,
          config: PipelineConfig = PipelineConfig.default): Seq[Result] = {
    val all = datasets(spark, rawDir)
    val known = all.map(_._1).toSet
    // selection: --datasets wins; else the config's tables: section
    // (when present) names the configured set, like the reference's
    // "all configured datasets" default
    val wanted = select
      .orElse(Option(config.tables.keys.toSeq).filter(_.nonEmpty))
    wanted.toSeq.flatten.foreach(name => require(known(name),
      s"unknown dataset '$name' (known: ${all.map(_._1).mkString(", ")})"))
    val chosen = wanted match {
      case Some(names) => all.filter { case (n, _) => names.contains(n) }
      case None        => all
    }
    chosen.map { case (name, mk) =>
      try {
        val out = s"$outDir/${config.tables.getOrElse(name, name)}"
        mk().write.mode(config.saveMode).parquet(out)
        // S7-style post-load verification against the landed sink.
        val n = spark.read.parquet(out).count()
        Result(name, n, None)
      } catch {
        case e: Throwable => Result(name, -1L, Some(e.toString.take(300)))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    var positional = Vector.empty[String]
    var select: Option[Seq[String]] = None
    var configPath: Option[String] = None
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--datasets" =>
          select = Some(args(i + 1).split(",").toSeq.filter(_.nonEmpty)); i += 2
        case "--config" =>
          configPath = Some(args(i + 1)); i += 2
        case p => positional :+= p; i += 1
      }
    }
    val config = configPath.map(PipelineConfig.load)
      .getOrElse(PipelineConfig.default)
    val outDir = positional.headOption.orElse(config.outDir)
      .getOrElse("target/tmp/garmin_out")
    val rawDir = positional.lift(1).orElse(config.rawDir)
      .getOrElse(GarminRaw.defaultRawDir)
    val spark = Sessions.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = run(spark, outDir, rawDir, select, config)
    results.foreach { r =>
      println(f"[pipeline] ${r.dataset}%-18s rows=${r.rows}%6d ${r.error.getOrElse("OK")}")
    }
    val failed = results.count(_.error.nonEmpty)
    println(s"[pipeline] ${results.size - failed}/${results.size} datasets loaded")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
