package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the handful of scalar functions Spark's
  * built-ins cannot express (SURVEY §2.10). All implement `doGenCode` so they
  * stay inside whole-stage codegen (a static call into
  * [[graft.functions.TextKernels]]) instead of falling back to interpreted
  * evaluation — at 100 TB the difference between a codegen'd expression and a
  * Scala UDF (ser/de per row) is material.
  */

/** Reference `perustats/inei/utils/file_utils.py:12-23` (semantics only). */
case class Slugify(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(TextKernels.slugify(v.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.TextKernels.slugify($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "slugify"
}

/** NFD-decompose + drop combining marks ("ñandú" -> "nandu").
  * Reference `perustats/infogob/11_locations_refs.py:45-63` (semantics only).
  */
case class StripAccents(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(TextKernels.stripAccents(v.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.TextKernels.stripAccents($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "strip_accents"
}

/** Polynomial rolling hash (document fingerprint), mod 1e9+7. */
case class RollingHash(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextKernels.rollingHash(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.rollingHash($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash"
}

object expressions {
  def slugify(c: Column): Column = Bridge.column(Slugify(Bridge.expression(c)))
  def stripAccents(c: Column): Column = Bridge.column(StripAccents(Bridge.expression(c)))
  def rollingHash(c: Column): Column = Bridge.column(RollingHash(Bridge.expression(c)))
}
