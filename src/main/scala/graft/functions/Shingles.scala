package graft.functions

import org.apache.spark.sql.{Column, GraftExpr}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles in one fused pass — replaces the
  * split + sequence + transform + slice + concat_ws + array_distinct
  * composition (five nested higher-order expressions, interpreted and
  * expensive to plan/codegen; measured ~2 s of per-query warmup at
  * bench scale). Semantics match the composition exactly: tokens split
  * on a single space (empty tokens from runs of spaces KEPT, as both
  * Spark's `split` and DuckDB's `string_split` do), windows of `n`
  * joined with one space, distinct keeping first occurrence, empty
  * array when fewer than `n` tokens.
  */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "shingle size must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingles requires string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    ShinglesImpl.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShinglesImpl.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object ShinglesImpl {
  def shingles(text: UTF8String, n: Int): ArrayData = {
    // limit -1 keeps trailing empty tokens — same as Spark split()
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

object Shingles {
  def shingles(text: Column, n: Int): Column =
    GraftExpr.column(ShinglesExpr(GraftExpr.expression(text), n))
}
