package graft.functions

import org.apache.spark.sql.{Column, GraftExpr}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** adler32 of a string key — the reference's default sink `part_fn`
  * (reference pysrc/bytewax/outputs.py:100-127 routes (key, value) to
  * partitions by `zlib.adler32(key)`). JDK `java.util.zip.Adler32` is
  * the same algorithm, so layouts are byte-compatible with a reference
  * deployment's. Codegen'd; value is the unsigned 32-bit sum in a long.
  */
case class Adler32Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"adler32 requires string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    Adler32Impl.adler32(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Adler32Impl.adler32($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Adler32Expr =
    copy(child = newChild)
}

object Adler32Impl {
  def adler32(bytes: Array[Byte]): Long = {
    val a = new java.util.zip.Adler32()
    a.update(bytes)
    a.getValue
  }
}

object Adler32 {
  def adler32(key: Column): Column =
    GraftExpr.column(Adler32Expr(GraftExpr.expression(key)))
}
