package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `round(x, scale)` with CPython semantics: correctly-rounded decimal of
  * the EXACT binary value with ties-to-even — `new BigDecimal(x)` (exact
  * binary expansion, not the shortest decimal repr) + HALF_EVEN.
  *
  * No Spark built-in can express this: `round`/`bround` operate on
  * `BigDecimal.valueOf(x)` (the shortest representation), so
  * round(2.15, 1) -> 2.2 while CPython (and the reference's pandas
  * chain that produced the golden files, `PBI ...Wrangling.ipynb` cell 60
  * `round(seconds/3600, 1)`) yields 2.1 because the stored double is
  * 2.1499…9. Implemented as a native Catalyst `UnaryExpression` with
  * `doGenCode` (a static call, inlined into whole-stage codegen) rather
  * than a Scala UDF — null handling, constant folding, and codegen all
  * come from the expression contract.
  */
case class PyRound(child: Expression, scale: Int)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "py_round"

  override protected def nullSafeEval(input: Any): Any =
    PyRound.round(input.asInstanceOf[Double], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.PyRound.round($c, $scale)")

  override protected def withNewChildInternal(newChild: Expression): PyRound =
    copy(child = newChild)
}

object PyRound {

  /** Static entry point shared by interpreted eval and generated code. */
  def round(x: Double, scale: Int): Double =
    if (x.isNaN || x.isInfinite) x
    else new java.math.BigDecimal(x)
      .setScale(scale, java.math.RoundingMode.HALF_EVEN)
      .doubleValue()

  /** Column wrapper: py_round(c, scale). The child is cast to double at
    * the call site (the expression itself declares no implicit coercion).
    */
  def apply(c: Column, scale: Int): Column =
    ColumnBridge.column(PyRound(ColumnBridge.expression(c.cast("double")), scale))
}
