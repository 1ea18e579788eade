package graft.functions

import org.apache.spark.sql.{Column, GraftExpr}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane LSH bucket id — fused custom expression. Bit b is
  * the sign of dot(v, h_b) where h_b[i] ∈ {−1, +1} comes from the
  * parity of splitmix64(i · 31 + b) — deterministic, no stored model.
  * Matches [[Similarity.lshBucket]]'s contract; single pass over the
  * vector instead of bits × dims interpreted lambda evals.
  */
case class LshBucketExpr(child: Expression, bits: Int) extends UnaryExpression {
  // 30-bit ceiling: the (dim, bit) → dim·31 + bit plane index is
  // injective only for bit < 31, and autoBits caps at 24 anyway
  require(bits > 0 && bits <= 30, "bucket id packs into a long; bits must be in [1, 30]")
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"lsh_bucket requires array<float|double>, got $t")
  }

  private val isFloat = () => child.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (isFloat()) LshBucketImpl.bucketF(arr, bits) else LshBucketImpl.bucketD(arr, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat()) "bucketF" else "bucketD"
    defineCodeGen(ctx, ev, c => s"graft.functions.LshBucketImpl.$fn($c, $bits)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

object LshBucketImpl {
  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** +1/−1 hyperplane component for (dim i, bit b). */
  private def sign(i: Int, b: Int): Double =
    if ((splitmix64(i.toLong * 31 + b) & 1L) == 0L) 1.0 else -1.0

  def bucketF(v: ArrayData, bits: Int): Long = {
    val n = v.numElements()
    var out = 0L
    var b = 0
    while (b < bits) {
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getFloat(i).toDouble * sign(i, b); i += 1 }
      if (dot >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def bucketD(v: ArrayData, bits: Int): Long = {
    val n = v.numElements()
    var out = 0L
    var b = 0
    while (b < bits) {
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getDouble(i) * sign(i, b); i += 1 }
      if (dot >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** +1/−1 hyperplane component for (table t, dim i, bit b) — the
    * packed index is collision-free for i < 2²⁴, b < 2⁸, so every
    * table draws independent hyperplanes.
    */
  private def signT(t: Int, i: Int, b: Int): Double =
    if ((splitmix64((t.toLong << 32) | (i.toLong << 8) | b.toLong) & 1L) == 0L) 1.0 else -1.0

  def sketchF(v: ArrayData, bits: Int, tables: Int): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        var dot = 0.0
        var i = 0
        while (i < n) { dot += v.getFloat(i).toDouble * signT(t, i, b); i += 1 }
        if (dot >= 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def sketchD(v: ArrayData, bits: Int, tables: Int): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        var dot = 0.0
        var i = 0
        while (i < n) { dot += v.getDouble(i) * signT(t, i, b); i += 1 }
        if (dot >= 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `tables` independent random-hyperplane sketches in one pass —
  * array<long> of `bits`-bit bucket ids, table t's hyperplane for
  * (dim i, bit b) drawn from the parity of
  * splitmix64((t<<32) | (i<<8) | b) (collision-free index packing, so
  * tables are genuinely independent; the single-table [[LshBucketExpr]]
  * keeps its original i·31+b stream for DuckDB-oracle parity). The
  * OR-amplification primitive behind
  * [[Similarity.bucketedCosinePairsAuto]]: a pair is a candidate if it
  * colocates in ANY table, recall 1−(1−p^bits)^tables for colocation
  * probability p = 1−θ/π.
  */
case class LshSketchExpr(child: Expression, bits: Int, tables: Int) extends UnaryExpression {
  require(bits > 0 && bits <= 30, "bucket id packs into a long; bits must be in [1, 30]")
  require(tables > 0 && tables <= 64, "tables must be in [1, 64]")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"lsh_sketch requires array<float|double>, got $t")
  }

  private val isFloat = () => child.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (isFloat()) LshBucketImpl.sketchF(arr, bits, tables)
    else LshBucketImpl.sketchD(arr, bits, tables)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat()) "sketchF" else "sketchD"
    defineCodeGen(ctx, ev, c => s"graft.functions.LshBucketImpl.$fn($c, $bits, $tables)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshSketchExpr =
    copy(child = newChild)
}

object LshBucket {
  def lsh_bucket(vec: Column, bits: Int): Column =
    GraftExpr.column(LshBucketExpr(GraftExpr.expression(vec), bits))

  def lsh_sketch(vec: Column, bits: Int, tables: Int): Column =
    GraftExpr.column(LshSketchExpr(GraftExpr.expression(vec), bits, tables))
}
