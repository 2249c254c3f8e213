package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, LongType}

/** Integer dot product of two int8-quantized vectors as a native
  * codegen'd expression — the [[DotF]] story for the quantized ANN
  * scan: `aggregate(zip_with(a, b, (x, y) => x.cast(long) *
  * y.cast(long)), 0L, _ + _)` runs its lambda interpreted per element,
  * and the 1-byte/dim scan exists precisely to make the inner loop
  * cheap. Exact in long (127·127·dim is nowhere near overflow); same
  * null/length contract as zip_with: null array, null element, or
  * unequal lengths produce NULL.
  */
case class DotI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_i8"

  /** Enforced by the ANALYZER, so it guards BOTH execution paths — the
    * previous interpreted-only `require` let a codegen'd plan read a
    * non-tinyint array through `getByte` and return garbage silently
    * (DotI8Spec pins the array<int> rejection).
    */
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_i8 expects two array<tinyint> arguments, got $l and $r")
    }

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotI8.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("doti")
      s"""
         |java.lang.Long $r = graft.expressions.DotI8.dot($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotI8 =
    copy(left = newLeft, right = newRight)
}

object DotI8 {

  def dot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotI8(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
