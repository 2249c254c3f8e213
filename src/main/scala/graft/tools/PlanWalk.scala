package graft.tools

import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan tree walk that reflects what EXECUTES, not what
  * prints: descends through AQE final plans, query stages, cached
  * relations, and subqueries, and DEDUPLICATES nodes by reference
  * identity — an InMemoryRelation's build lineage or a
  * ReusedExchange's target appears once however many consumers print
  * it. `executedPlan.toString`-based counts track printing (a cached
  * frame's lineage reprints per consumer), which is why several
  * expensive queries had to be waived from PlanSpec's exchange
  * budgets; identity-walk counts are stable and pinnable for exactly
  * those queries.
  */
object PlanWalk {

  /** Every distinct-by-reference physical node reachable from `p`. */
  def distinctNodes(p: SparkPlan): Seq[SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    val out = Seq.newBuilder[SparkPlan]
    def walk(n: SparkPlan): Unit =
      if (seen.add(n)) {
        out += n
        val kids: Seq[SparkPlan] = (n match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case s: QueryStageExec        => Seq(s.plan)
          case i: InMemoryTableScanExec => Seq(i.relation.cachedPlan)
          case o                        => o.children
        }) ++ n.subqueries
        kids.foreach(walk)
      }
    walk(p)
    out.result()
  }

  /** (distinct exchanges, distinct file scans) that actually execute. */
  def exchangeScanCounts(p: SparkPlan): (Int, Int) = {
    val nodes = distinctNodes(p)
    (nodes.count(_.getClass.getSimpleName.contains("Exchange")),
     nodes.count(_.getClass.getSimpleName.contains("FileSourceScan")))
  }
}
