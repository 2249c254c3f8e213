package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checked query per implemented operator (SURVEY §2 + the
  * large-scale extension operators). Each [[Q]] keeps the Spark plan and
  * its DuckDB oracle SQL side by side so they cannot drift.
  *
  * Oracle-parity rules used throughout (see tools/check.py for the local
  * harness that enforces them pre-commit):
  *   - every query ends in a deterministic total ORDER BY on both sides;
  *   - SUM/AVG over doubles goes through an exact DECIMAL cast and back to
  *     double (order-independent, so partial aggregation can't change the
  *     result), e.g. CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE);
  *   - cross-engine hashing uses md5-derived longs (functions.HashFns),
  *     never Spark-specific hash()/xxhash64();
  *   - aggregate/computed columns carry identical aliases on both sides.
  */
final case class Q(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Queries {
  private def groups: Seq[Seq[Q]] = Seq(
    QueriesRelational.qs,
    QueriesCoverage.qs,
    QueriesSources.qs,
    QueriesDatasets.qs,
    QueriesText.qs,
    QueriesSimilarity.qs,
    QueriesEvents.qs,
    QueriesMultimodal.qs,
    QueriesGovernance.qs
  )

  lazy val all: Map[String, (SparkSession, String) => DataFrame] =
    groups.flatten.map(q => q.name -> q.spark).toMap

  lazy val oracles: Map[String, String] =
    groups.flatten.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
