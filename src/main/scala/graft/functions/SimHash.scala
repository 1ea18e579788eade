package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a token array — a custom Catalyst `Expression`
  * with `doGenCode` (stays inside whole-stage codegen; no UDF
  * serialization, single pass over the tokens).
  *
  * Semantics: per token a 64-bit FNV-1a hash; each bit votes ±1; the
  * sign vector packs into a long. Near-duplicate texts land within a
  * few bits of Hamming distance (compare with `bit_count(a ^ b)`).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires array<string>, got ${child.dataType}")
    }

  override def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHashImpl {
  /** FNV-1a 64-bit over UTF-8 bytes. */
  def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def simhash(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        val h = fnv1a(t.getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Hash a UTF8String directly (used by generated code paths). */
  def fnv1a(s: UTF8String): Long = fnv1a(s.getBytes)
}

/** FNV-1a 64 of a string column — the item hash for sketch inputs
  * ([[Cms]], corpus MinHash signatures) where the oracle must replay
  * the hash in DuckDB (xxhash64's seed/finalizer is not SQL-renderable;
  * FNV-1a is an ordered byte fold).
  */
case class Fnv1a64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fnv1a64 requires string, got $t")
    }
  override def nullSafeEval(input: Any): Any =
    SimHashImpl.fnv1a(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.fnv1a($c)")
  override protected def withNewChildInternal(newChild: Expression): Fnv1a64Expr =
    copy(child = newChild)
}

object SimHash {
  /** Column wrapper: simhash64(array<string>) → long. */
  def simhash64(tokens: Column): Column =
    GraftExpr.column(SimHash64(GraftExpr.expression(tokens)))

  /** Column wrapper: fnv1a64(string) → long. */
  def fnv1a64(s: Column): Column =
    GraftExpr.column(Fnv1a64Expr(GraftExpr.expression(s)))

  /** Hamming distance between two simhashes (built-in, codegen'd). */
  def hamming(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))
}
