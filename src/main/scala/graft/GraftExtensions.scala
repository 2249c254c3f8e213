package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.expressions.{DotF, Md5Long, PyRound}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions with the SQL function registry, so `spark.sql` users get
  * them too (`SELECT py_round(x, 1) FROM t`). Wire up either via
  * `Sessions.builder` (done) or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("py_round"),
      new ExpressionInfo(classOf[PyRound].getName, "py_round"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "py_round(expr, scale) takes exactly 2 arguments")
        val scale = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"py_round scale must be an integer literal, got $other")
        }
        PyRound(children.head, scale)
      }))
    ext.injectFunction((
      FunctionIdentifier("md5_long"),
      new ExpressionInfo(classOf[Md5Long].getName, "md5_long"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "md5_long(expr) takes exactly 1 argument")
        Md5Long(org.apache.spark.sql.catalyst.expressions.Cast(
          children.head, org.apache.spark.sql.types.StringType))
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_f"),
      new ExpressionInfo(classOf[DotF].getName, "dot_f"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "dot_f(a, b) takes exactly 2 arguments")
        DotF(children.head, children(1))
      }))
  }
}
