package graft.tools

/** Dev-only probe: print executed-plan exchange/scan counts for the
  * queries named in args (PlanSpec budget calibration).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { q =>
      val d = graft.Queries.all(q)(spark, sf)
      d.collect()
      val plan = d.queryExecution.executedPlan.toString
      val ex = "Exchange".r.findAllIn(plan).size
      val scans = "FileScan".r.findAllIn(plan).size
      // executedPlan.toString marks codegen stages as `*(n)` prefixes
      // (the "WholeStageCodegen" literal only appears in formatted
      // explain); count DISTINCT stage ids so repeated prints of a
      // reused subtree don't inflate the span count
      val codegen = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
        .map(_.group(1)).toSet.size
      // printed counts (above) vs identity-walk counts (below): the
      // latter dedup cached/reused lineage and are what PlanSpec's
      // executed-exchange budgets pin
      val (dex, dscan) = PlanWalk.exchangeScanCounts(
        d.queryExecution.executedPlan)
      println(s"PROBE $q exchanges=$ex scans=$scans " +
        s"codegenSpans=$codegen distinctExchanges=$dex " +
        s"distinctScans=$dscan")
      if (sys.env.contains("SPARK_GRAFT_PLAN_DUMP")) println(plan)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
