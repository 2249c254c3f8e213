package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{bround, lit}

/** THE fp stabilizer: half-even round to `decimals` places, with its
  * DuckDB mirror kept adjacent so the two sides cannot drift.
  *
  * Purpose: collapse last-ulp cross-engine noise — summation-order
  * differences in means of non-integer doubles, fused-multiply-add in
  * one engine's compiled closers, interpolation operation order — in
  * values whose meaningful precision sits far above the noise floor
  * (1e-16 noise vs a 1e-6 or 1e-12 grid). Both engines compute
  * rint(x·10^d)/10^d on their own x; as long as the two x differ by
  * ulps and the grid is coarse, they land on the same double.
  *
  * bround(c) on doubles reduces to rint off representation ties (see
  * PipelineOps.npRound1 scaladoc), matching DuckDB's round_even on the
  * same product. Powers of ten through 1e22 are binary-exact, so the
  * multiply is the same in both engines.
  */
object Stabilize {

  def stab(c: Column, decimals: Int): Column = {
    // decimal PARSE, not math.pow: Math.pow is only spec'd to 1 ulp,
    // while parsing "1eN" is correctly rounded — and 10^N is
    // binary-exact through 1e22, so the parsed double IS the power the
    // stabSql literal denotes
    val p = lit(s"1e$decimals".toDouble)
    bround(c * p) / p
  }

  /** DuckDB SQL fragment mirroring [[stab]]. */
  def stabSql(e: String, decimals: Int): String = {
    val p = "1" + ("0" * decimals) + ".0"
    s"round_even(($e) * $p, 0) / $p"
  }
}
