package graft.functions

import org.apache.spark.sql.{Column, GraftExpr}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** MinHash signature of a shingle set — custom Catalyst `Expression`
  * with `doGenCode`. One FNV-1a base hash per shingle, then `numHashes`
  * affine permutations h_k(x) = a_k·x + b_k (odd a_k from splitmix64),
  * tracking per-k minima in a single pass.
  *
  * The equivalent built-in composition
  * `transform(sequence(0,63), k -> array_min(transform(sh, s -> xxhash64(s,k))))`
  * is CodegenFallback and re-hashes every shingle per k — ~450× slower
  * at 64 hashes on the benchmark corpus.
  */
case class MinHashSigExpr(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig requires array<string>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashImpl.signature(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashImpl.signature($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashImpl {
  /** splitmix64 — derives the per-k permutation constants. */
  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val maxHashes = 512
  private[functions] val as: Array[Long] = Array.tabulate(maxHashes)(k => splitmix64(2L * k) | 1L)
  private[functions] val bs: Array[Long] = Array.tabulate(maxHashes)(k => splitmix64(2L * k + 1))

  /** The (a_k, b_k) affine constants for hashes 0..numHashes-1 — public
    * so the DuckDB oracle can inline the exact same permutation family
    * as literals instead of re-deriving splitmix64 in SQL.
    */
  def constants(numHashes: Int): IndexedSeq[(Long, Long)] =
    (0 until numHashes).map(k => (as(k), bs(k)))

  def signature(shingles: ArrayData, numHashes: Int): GenericArrayData = {
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      if (s != null) {
        val base = SimHashImpl.fnv1a(s.getBytes)
        var k = 0
        while (k < numHashes) {
          val h = as(k) * base + bs(k)
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

object MinHash {
  /** minhash_sig(shingles, numHashes) → array<long>. */
  def minhash_sig(shingles: Column, numHashes: Int): Column =
    GraftExpr.column(MinHashSigExpr(GraftExpr.expression(shingles), numHashes))
}
