package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dense-vector dot product as ONE native codegen'd expression.
  *
  * The composed form `aggregate(zip_with(a, b, (x, y) => x.cast(double)
  * * y.cast(double)), 0.0, _ + _)` is semantically right but executes
  * as higher-order functions: zip_with materializes an intermediate
  * array and the lambda evaluates INTERPRETED per element — for a
  * brute-force ANN scan that is the entire inner loop. This expression
  * is the same arithmetic as a tight generated loop: double
  * accumulation in index order, so the result is bit-identical to the
  * composed form and to the DuckDB mirror
  * (`list_sum(list_transform(list_zip(a, b), ...))`) — the similarity
  * oracles don't change.
  *
  * Null/shape contract (matches the composed form exactly): a null
  * array, a null element, or unequal lengths (zip_with null-pads the
  * shorter side, which nulls the sum) produce NULL. Element types may
  * be float or double on each side independently (embeddings are
  * float[]; Lloyd centroids come out of avg() as double[]).
  */
case class DotF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"dot_f expects array<float> or array<double>, got $t")
  }
  private lazy val leftFloat = isFloat(left)
  private lazy val rightFloat = isFloat(right)

  /** Analyzer-enforced (like DotI8): a wrong element type fails the
    * query at analysis with a typed error on both execution paths,
    * instead of an IllegalArgumentException thrown mid-codegen.
    */
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_f expects array<float>/array<double> arguments, got $l and $r")
    }

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotF.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotr")
      s"""
         |java.lang.Double $r = graft.expressions.DotF.dot(
         |  $a, $b, $leftFloat, $rightFloat);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF =
    copy(left = newLeft, right = newRight)
}

object DotF {

  /** Static entry point shared by interpreted eval and generated code.
    * Index-order double accumulation; null on null element or length
    * mismatch (the zip_with contract).
    */
  def dot(a: ArrayData, b: ArrayData,
          aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotF(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
