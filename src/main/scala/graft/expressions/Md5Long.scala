package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine-portable 60-bit hash (functions.HashFns contract: first 15
  * hex chars of the md5 digest as a non-negative long) as ONE native
  * codegen'd expression.
  *
  * The composed form `conv(substring(md5(c), 1, 15), 16, 10).cast(long)`
  * materializes two intermediate strings per row — md5's 32-char hex
  * encoding and the 15-char substring — then re-parses digits. This
  * expression digests the UTF-8 bytes and assembles the long from the
  * first 7.5 digest bytes directly: same value bit-for-bit (the DuckDB
  * mirror `HashFns.md5LongSql` is unchanged), no string round-trips.
  * md5-per-row dominates the MinHash/SimHash/fingerprint family at
  * corpus scale, so this is the hot path of every similarity query.
  *
  * Implemented as a `UnaryExpression` with `doGenCode` (static call,
  * inlined into whole-stage codegen); the digest instance is
  * thread-local — codegen evaluates expressions single-threaded per
  * task, but tasks share the JVM.
  */
// Input must be StringType — both construction paths (the Column
// wrapper and the SQL builder) insert the cast; ExpectsInputTypes is
// not an option here (AbstractDataType is private[sql] in Spark 4).
case class Md5Long(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_long"

  override protected def nullSafeEval(input: Any): Any =
    Md5Long.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5Long.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long =
    copy(child = newChild)
}

object Md5Long {

  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Static entry point shared by interpreted eval and generated code:
    * first 60 bits of md5(bytes) — identical to parsing the first 15
    * hex chars of the hex digest (7 full bytes + the high nibble of
    * byte 7). Always non-negative.
    */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  def apply(c: Column): Column =
    ColumnBridge.column(Md5Long(ColumnBridge.expression(c.cast("string"))))
}
