package graft.tools

import java.nio.file.{Files, Paths}

/** Dev-only: write `.explain("formatted")` for the named queries to
  * plans/<tag>/<query>_<suffix>.txt (optimization-round evidence files;
  * the judge checks plan claims against these). Usage:
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_PLAN_TAG=r15 \
  *     SPARK_GRAFT_PLAN_SUFFIX=before \
  *     sbt "runMain graft.tools.PlanDump q_a q_b"
  *
  * The formatted explain is taken AFTER an execution through the noop
  * sink so AQE's final plan (join rewrites, coalesced reads) is what
  * gets committed, not the pre-execution placeholder.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "r15")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val spark = graft.Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Paths.get("plans", tag)
    Files.createDirectories(dir)
    args.foreach { q =>
      val d = graft.Queries.all(q)(spark, sf)
      d.write.format("noop").mode("overwrite").save()
      // "formatted" on the executed frame: with AQE the tree prints the
      // final stages for everything that ran.
      val txt = d.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val (dex, dscan) = PlanWalk.exchangeScanCounts(
        d.queryExecution.executedPlan)
      Files.writeString(dir.resolve(s"${q}_$suffix.txt"),
        s"== $q ($suffix) distinctExchanges=$dex distinctScans=$dscan ==\n" +
          txt + "\n")
      println(s"DUMPED $q -> plans/$tag/${q}_$suffix.txt " +
        s"exchanges=$dex scans=$dscan")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
