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
  * bit-for-bit).
  *
  * Exact arithmetic WITHOUT decimal: values are fixed-point with
  * `decimals` fractional digits, so each is representable as a scaled
  * LONG `v = round(x·10^d)` and every pairwise product `v_i·v_j` is an
  * exact long. Products are summed as TWO long aggregates — quotient
  * and remainder by 10^9 — because a single long sum would overflow
  * past ~10^5 rows; the pair (hi, lo) reconstructs the exact integer
  * total `10^9·Σhi + Σlo` in one decimal op per CELL (36 cells, one
  * row), not per input row. Everything per-row is long multiply /
  * divide inside whole-stage codegen — the previous decimal(38,8)
  * formulation allocated a BigDecimal per co-moment per row and
  * benched 12 s at sf0.1; this one is ~1 s on the same data.
  * Truncated-vs-floored div/mod conventions don't matter cross-engine:
  * reconstruction is linear, so any per-row (hi, lo) split with
  * `p = 10^9·hi + lo` yields the same exact Σp on both engines.
  *
  * The 10^d scale factors CANCEL in Pearson r — cov(i,j) scales by
  * 10^(2d) and sqrt(cov(i,i)·cov(j,j)) by the same — so r is computed
  * directly from the scaled sums with no rescaling step.
  *
  * Precision contract: scaled values |v| must fit products in a long
  * (|v| < 3·10^9, i.e. |x| < 3·10^(9−d)), and row count below ~10^9
  * per partition-tree… in practice n < 9·10^9 keeps Σlo < 2^63. The
  * exact integer totals are cast to double ONCE (correctly rounded on
  * both engines); the closing covariance arithmetic runs in double.
  *
  * Output is long form — (col_a, col_b, pearson_r) for every ordered
  * pair col_a <= col_b including the diagonal — which hashes cleanly
  * and pivots trivially.
  *
  * The final r is rounded half-even to 12 decimals: the closing
  * arithmetic (n·sxy − sx·sy over identical doubles) is NOT
  * cross-engine stable at the last ulp — compilers that emit fused
  * multiply-add (DuckDB's does) skip the intermediate rounding the JVM
  * performs — and 1e-16 noise in a statistic bounded by |r| ≤ 1 is
  * measurement-meaningless anyway.
  */
object Correlation {

  private val Split = 1000000000L // 10^9: hi/lo radix for product sums

  private def stab12(c: Column): Column =
    graft.functions.Stabilize.stab(c, 12)

  /** DuckDB mirror of [[stab12]]. */
  def stab12Sql(e: String): String =
    graft.functions.Stabilize.stabSql(e, 12)

  /** Per-group Pearson r for ONE column pair — the grouped sibling of
    * [[matrix]] (which is global). Moments accumulate as exact
    * DECIMAL sums (order-independent, partial-aggregation safe; the
    * x·y doubles sit within ulps of the `prodScale`-decimal grid, so
    * both engines' double→decimal casts land on the same grid point);
    * only the closing covariance arithmetic runs in double, 12-decimal
    * stabilized like [[matrix]]'s. One map-side-combining groupBy —
    * no window, no second pass.
    */
  def pairByGroup(df: DataFrame, keyCols: Seq[String], xCol: String,
                  yCol: String, prodScale: Int = 4): DataFrame = {
    require(keyCols.nonEmpty, "need at least one group column")
    def dec(c: Column) = sum(c.cast(s"decimal(38,$prodScale)"))
    val x = col(xCol); val y = col(yCol)
    val m = df.filter(x.isNotNull && y.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        dec(x).as("__sx"), dec(y).as("__sy"),
        dec(x * x).as("__sxx"), dec(y * y).as("__syy"),
        dec(x * y).as("__sxy"))
    val n   = col("n").cast("double")
    val sx  = col("__sx").cast("double");  val sy  = col("__sy").cast("double")
    val sxx = col("__sxx").cast("double"); val syy = col("__syy").cast("double")
    val sxy = col("__sxy").cast("double")
    m.select(keyCols.map(col) ++ Seq(col("n"),
      stab12((n * sxy - sx * sy)
        / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
        .as("pearson_r")): _*)
  }

  def matrix(df: DataFrame, cols: Seq[String], decimals: Int = 2): DataFrame = {
    require(cols.nonEmpty, "corr matrix needs at least one column")
    val idx = cols.indices
    val mult = math.pow(10, decimals).toLong
    // One scaled-long projection feeding every aggregate. The
    // precision contract (|v| < 3·10^9 so every pairwise product fits
    // a long) is ENFORCED here, not just documented: an out-of-range
    // value raises through raise_error instead of silently wrapping
    // the BIGINT product into a wrong-but-plausible correlation. The
    // branch is codegen'd per row next to the multiplies — noise
    // against the N² product sums.
    val Bound = 3000000000L
    val scaled = df.select(idx.map { i =>
      val v = expr(s"CAST(round(${cols(i)} * $mult) AS BIGINT)")
      when(abs(v) >= Bound, expr(
          s"""raise_error(concat('Correlation.matrix: |${cols(i)}| = ',
             |CAST(${cols(i)} AS STRING),
             |' scaled by 10^$decimals exceeds the 3e9 long-product
             | contract; reduce `decimals` or pre-scale the column'))"""
            .stripMargin.replace("\n", "")))
        .otherwise(v).as(s"v_$i")
    }: _*)
    val sums: Seq[Column] =
      count(lit(1)).cast("double").as("n") +:
      idx.flatMap(i => Seq(
        expr(s"SUM(v_$i DIV $Split)").as(s"s_hi_$i"),
        expr(s"SUM(v_$i % $Split)").as(s"s_lo_$i"))) ++:
      (for (i <- idx; j <- idx if j >= i) yield Seq(
        expr(s"SUM((v_$i * v_$j) DIV $Split)").as(s"p_hi_${i}_$j"),
        expr(s"SUM((v_$i * v_$j) % $Split)").as(s"p_lo_${i}_$j"))).flatten
    val m = scaled.agg(sums.head, sums.tail: _*)
    // exact integer total -> double, rounded once (36 cells, one row)
    def rec(hi: String, lo: String): Column =
      (col(hi).cast("decimal(38,0)") * lit(Split) + col(lo)).cast("double")
    val withTotals = m.select(
      col("n") +:
      idx.map(i => rec(s"s_hi_$i", s"s_lo_$i").as(s"s_$i")) ++:
      (for (i <- idx; j <- idx if j >= i) yield
        rec(s"p_hi_${i}_$j", s"p_lo_${i}_$j").as(s"p_${i}_$j")): _*)
    def cov(i: Int, j: Int): Column =
      col("n") * col(s"p_${i}_$j") - col(s"s_$i") * col(s"s_$j")
    val entries = for (i <- idx; j <- idx if j >= i) yield
      struct(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
        stab12(cov(i, j) / sqrt(cov(i, i) * cov(j, j))).as("pearson_r"))
    withTotals.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
  }

  /** DuckDB SQL mirroring [[matrix]] over `table` — kept adjacent so the
    * two sides cannot drift. SUM(BIGINT) is HUGEINT in DuckDB, so the
    * hi/lo reconstruction is exact integer arithmetic there too.
    */
  def matrixSql(table: String, cols: Seq[String], decimals: Int = 2): String = {
    val idx = cols.indices
    val mult = math.pow(10, decimals).toLong
    val sv = idx.map(i =>
      s"CAST(round(${cols(i)} * $mult) AS BIGINT) AS v_$i")
    val sums =
      Seq("CAST(count(*) AS DOUBLE) AS n") ++
      idx.flatMap(i => Seq(
        s"SUM(v_$i // $Split) AS s_hi_$i",
        s"SUM(v_$i % $Split) AS s_lo_$i")) ++
      (for (i <- idx; j <- idx if j >= i) yield Seq(
        s"SUM((v_$i * v_$j) // $Split) AS p_hi_${i}_$j",
        s"SUM((v_$i * v_$j) % $Split) AS p_lo_${i}_$j")).flatten
    def rec(hi: String, lo: String) =
      s"CAST($hi * $Split + $lo AS DOUBLE)"
    val totals =
      Seq("n") ++
      idx.map(i => s"${rec(s"s_hi_$i", s"s_lo_$i")} AS s_$i") ++
      (for (i <- idx; j <- idx if j >= i) yield
        s"${rec(s"p_hi_${i}_$j", s"p_lo_${i}_$j")} AS p_${i}_$j")
    def cov(i: Int, j: Int) = s"(n * p_${i}_$j - s_$i * s_$j)"
    val rows = for (i <- idx; j <- idx if j >= i) yield
      s"""SELECT '${cols(i)}' AS col_a, '${cols(j)}' AS col_b,
         |  ${stab12Sql(s"${cov(i, j)} / sqrt(${cov(i, i)} * ${cov(j, j)})")}
         |    AS pearson_r
         |FROM r""".stripMargin
    s"""WITH sv AS (
       |  SELECT ${sv.mkString(",\n    ")}
       |  FROM $table),
       |m AS (
       |  SELECT ${sums.mkString(",\n    ")}
       |  FROM sv),
       |r AS (
       |  SELECT ${totals.mkString(",\n    ")}
       |  FROM m)
       |${rows.mkString("\nUNION ALL\n")}""".stripMargin
  }
}
