package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-validation (the Deequ-shaped quality gate a
  * training pipeline runs before accepting a batch): a list of checks
  * compiles into ONE aggregation pass — never a job per check — and
  * comes back long-form as (check, metric, passed).
  *
  * Reference seam: the pipeline's load verification
  * (`ETL Scripts/db_utils.py` row-count checks) generalized to content
  * assertions. All metrics are chosen hash-exact across engines:
  * count-ratios are int/int divisions of exact longs, min/max are
  * order-independent, and the distinct check counts exactly (swap in
  * approx_count_distinct at 100 TB the same way Profile does — the
  * pass/fail threshold rarely sits inside HLL's 2%).
  *
  * One aggregate row holds every metric; the `stack` to long form is a
  * driver-free projection of that single row, so the whole gate is one
  * job with map-side partial aggregation regardless of check count.
  */
object Checks {

  sealed trait Check {
    def name: String
    /** (metric expression, pass predicate over the metric). */
    private[operators] def compile: (Column, Column => Column)
  }

  /** Fraction of NULLs in `col` must be <= `bound`. */
  final case class NullRateBelow(col: String, bound: Double) extends Check {
    val name = s"null_rate($col)<=$bound"
    private[operators] def compile = (
      sum(when(functions_col(col).isNull, 1L).otherwise(0L))
        / count(lit(1)),
      m => m <= lit(bound))
  }

  /** min(col) >= bound (nulls ignored, as aggregates do). */
  final case class MinAtLeast(col: String, bound: Double) extends Check {
    val name = s"min($col)>=$bound"
    private[operators] def compile =
      (min(functions_col(col)).cast("double"), m => m >= lit(bound))
  }

  /** max(col) <= bound. */
  final case class MaxAtMost(col: String, bound: Double) extends Check {
    val name = s"max($col)<=$bound"
    private[operators] def compile =
      (max(functions_col(col)).cast("double"), m => m <= lit(bound))
  }

  /** Exact distinct count >= k (use HLL at 100 TB, see scaladoc). */
  final case class DistinctAtLeast(col: String, k: Long) extends Check {
    val name = s"distinct($col)>=$k"
    private[operators] def compile =
      (countDistinct(functions_col(col)).cast("double"),
        m => m >= lit(k.toDouble))
  }

  /** Fraction of rows satisfying `predicateSql` must be >= bound.
    * The predicate is a SQL boolean expression over the frame's
    * columns, so the same string documents itself in the report.
    */
  final case class SatisfiesAtLeast(predicateSql: String, bound: Double)
      extends Check {
    val name = s"satisfies($predicateSql)>=$bound"
    private[operators] def compile = (
      sum(when(expr(predicateSql), 1L).otherwise(0L)) / count(lit(1)),
      m => m >= lit(bound))
  }

  private def functions_col(c: String) = org.apache.spark.sql.functions.col(c)

  /** One row per check: (check, metric double, passed boolean), in the
    * declared order via the `seq` column the caller may drop.
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val compiled = checks.map(c => (c.name, c.compile))
    val aggs = compiled.zipWithIndex.map { case ((_, (metric, _)), i) =>
      metric.cast("double").as(s"__m$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // Long form via explode(array(struct(...))) — check names travel as
    // Column LITERALS, never as SQL text, so a name containing quotes
    // (e.g. a SatisfiesAtLeast predicate with a string literal) can't be
    // mangled by the lexer or injected into the plan.
    val stacked = one.select(explode(array(
      compiled.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("check"), lit(i.toLong).as("seq"),
          functions_col(s"__m$i").as("metric"))
      }: _*)).as("r"))
      .select(functions_col("r.check").as("check"),
        functions_col("r.seq").as("seq"),
        functions_col("r.metric").as("metric"))
    val passExprs = compiled.zipWithIndex.foldLeft(
        when(lit(false), lit(false))) { case (acc, ((_, (_, pass)), i)) =>
      acc.when(functions_col("seq") === i, pass(functions_col("metric")))
    }
    stacked.select(functions_col("check"), functions_col("seq"),
      functions_col("metric"), passExprs.as("passed"))
  }
}
