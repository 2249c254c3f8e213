package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** All-pairs Pearson correlation matrix (SURVEY §2.5 A9 generalized).
  *
  * Reference: `df.corr()` over every numeric column of the analysis
  * frame (`2024 Marathon Training Analysis.ipynb:21099`, ~60 columns).
  *
  * Scale shape: ONE aggregation pass computes every co-moment — n, N
  * column sums, and N(N+1)/2 product sums — so the corpus is scanned
  * once regardless of N (map-side partial aggregation, one 1-row
  * result). Built-in `corr()` would cost one pass per PAIR and
  * accumulates doubles in partition order (not reproducible
  * bit-for-bit); the co-moments here go through exact DECIMAL sums, so
  * the matrix is identical under any partitioning and on any engine —
  * the DuckDB oracle replays it exactly.
  *
  * Output is long form — (col_a, col_b, pearson_r) for every ordered
  * pair col_a <= col_b including the diagonal — which hashes cleanly
  * and pivots trivially.
  *
  * Precision contract: column values must be exactly representable in
  * DECIMAL(28,4) and pairwise products in DECIMAL(38,8) — true for
  * integer and 2-decimal columns at any tested scale. Products are
  * formed in double first (exact while values fit in 53 bits, which
  * ints and cent-valued money do) and cast, matching the oracle's
  * arithmetic bit-for-bit.
  *
  * The final r is rounded half-even to 12 decimals: the closing
  * arithmetic (n·sxy − sx·sy over identical doubles) is NOT
  * cross-engine stable at the last ulp — compilers that emit fused
  * multiply-add (DuckDB's does) skip the intermediate rounding the JVM
  * performs — and 1e-16 noise in a statistic bounded by |r| ≤ 1 is
  * measurement-meaningless anyway.
  */
object Correlation {

  private def stab12(c: Column): Column =
    graft.functions.Stabilize.stab(c, 12)

  /** DuckDB mirror of [[stab12]]. */
  def stab12Sql(e: String): String =
    graft.functions.Stabilize.stabSql(e, 12)

  def matrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "corr matrix needs at least one column")
    val idx = cols.indices
    val sums: Seq[Column] =
      count(lit(1)).cast("double").as("n") +:
      idx.map(i => sum(col(cols(i)).cast("decimal(28,4)"))
        .cast("double").as(s"s_$i")) ++:
      (for (i <- idx; j <- idx if j >= i) yield
        // products in DOUBLE explicitly (the documented contract):
        // a native long*long multiply would silently wrap past 2^63
        // where the double product — exact below 2^53, the operator's
        // stated precision bound — stays correct
        sum((col(cols(i)).cast("double") * col(cols(j)).cast("double"))
          .cast("decimal(38,8)"))
          .cast("double").as(s"p_${i}_$j"))
    val m = df.agg(sums.head, sums.tail: _*)
    def cov(i: Int, j: Int): Column =
      col("n") * col(s"p_${i}_$j") - col(s"s_$i") * col(s"s_$j")
    val entries = for (i <- idx; j <- idx if j >= i) yield
      struct(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
        stab12(cov(i, j) / sqrt(cov(i, i) * cov(j, j))).as("pearson_r"))
    m.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
  }

  /** DuckDB SQL mirroring [[matrix]] over `table` — kept adjacent so the
    * two sides cannot drift.
    */
  def matrixSql(table: String, cols: Seq[String]): String = {
    val idx = cols.indices
    val sums =
      Seq("CAST(count(*) AS DOUBLE) AS n") ++
      idx.map(i =>
        s"CAST(SUM(CAST(${cols(i)} AS DECIMAL(28,4))) AS DOUBLE) AS s_$i") ++
      (for (i <- idx; j <- idx if j >= i) yield
        s"CAST(SUM(CAST(CAST(${cols(i)} AS DOUBLE) * " +
          s"CAST(${cols(j)} AS DOUBLE) AS DECIMAL(38,8)))" +
          s" AS DOUBLE) AS p_${i}_$j")
    def cov(i: Int, j: Int) = s"(n * p_${i}_$j - s_$i * s_$j)"
    val rows = for (i <- idx; j <- idx if j >= i) yield
      s"""SELECT '${cols(i)}' AS col_a, '${cols(j)}' AS col_b,
         |  ${stab12Sql(s"${cov(i, j)} / sqrt(${cov(i, i)} * ${cov(j, j)})")}
         |    AS pearson_r
         |FROM m""".stripMargin
    s"""WITH m AS (
       |  SELECT ${sums.mkString(",\n    ")}
       |  FROM $table)
       |${rows.mkString("\nUNION ALL\n")}""".stripMargin
  }
}
