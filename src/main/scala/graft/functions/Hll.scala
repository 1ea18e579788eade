package graft.functions

import org.apache.spark.sql.{Column, GraftExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** HyperLogLog distinct-count sketches as first-class MERGEABLE
  * columns (Flajolet et al. 2007) — the per-shard corpus statistic a
  * training pipeline stores alongside each data drop and re-merges
  * incrementally: distinct users/docs/urls per shard, per day, per
  * source, combined later without re-reading the data. Spark's
  * `approx_count_distinct` runs the same family internally but only
  * as an opaque one-shot aggregate — the sketch itself is not a value
  * you can persist, union across jobs, or serve. Here the sketch IS
  * the column: `hllSketch` produces 2^p registers as a binary,
  * `hllMerge` unions sketches (register-wise max — associative,
  * commutative, idempotent: re-merging a shard twice is harmless),
  * `hllEstimate` turns any sketch into a count.
  *
  * The register transform is deterministic integer arithmetic over a
  * caller-supplied 64-bit hash column (pair with [[Sampling.splitmix64]]
  * or `xxhash64`), so the `q_hll*` gates render the ENTIRE sketch —
  * all 2^p registers — bit-exactly in DuckDB SQL and hash-compare the
  * register arrays, not just an estimate. Standard error ≈
  * 1.04/√(2^p); p=12 (4 KB) gives ~1.6%.
  *
  * Scale shape: a partial-aggregable single pass — map-side partials
  * produce one 2^p-byte buffer per group per task, the exchange moves
  * sketches (not rows), exactly like `approx_count_distinct`. The
  * merge aggregate over pre-built shard sketches moves only the
  * sketch column: distinct-counting a 100 TB corpus's daily drops
  * costs one scan per NEW drop, never a re-scan of history.
  */
object Hll {

  /** Aggregate `hash` (LongType, e.g. splitmix64/xxhash64) into a
    * 2^p-register HLL sketch (binary). 4 <= p <= 16.
    */
  def hllSketch(hash: Column, p: Int): Column =
    GraftExpr.column(HllSketchAgg(GraftExpr.expression(hash), p).toAggregateExpression())

  /** Union pre-built sketches (register-wise max). All inputs must
    * share one p (enforced: mismatched lengths throw).
    */
  def hllMerge(sketch: Column): Column =
    GraftExpr.column(HllMergeAgg(GraftExpr.expression(sketch)).toAggregateExpression())

  /** Register-wise max of TWO sketches as a SCALAR expression — the
    * join-side merge for delta-propagation loops ([[Graph]]'s
    * frontier-pruned HyperBall): fold a node's accumulated delta
    * into its persisted ball inside a projection, no grouped
    * aggregate. Same associative/commutative/idempotent max as
    * [[hllMerge]] (bit-identical composition, spec-pinned);
    * mismatched p throws; nulls propagate.
    */
  def hllMerge2(a: Column, b: Column): Column =
    GraftExpr.column(HllMerge2Expr(GraftExpr.expression(a),
      GraftExpr.expression(b)))

  /** Distinct-count estimate of a sketch: bias-corrected harmonic
    * mean with linear counting on the low range.
    */
  def hllEstimate(sketch: Column): Column =
    GraftExpr.column(HllEstimateExpr(GraftExpr.expression(sketch)))

  /** Registers as array<int> — the gate/debug view of a sketch. */
  def hllRegisters(sketch: Column): Column =
    GraftExpr.column(HllRegistersExpr(GraftExpr.expression(sketch)))
}

object HllImpl {
  /** idx = top p bits; rho = 1 + leading zeros of the remaining 64-p
    * bits (64-p+1 when they are all zero).
    */
  def update(regs: Array[Byte], hash: Long, p: Int): Unit = {
    val idx = (hash >>> (64 - p)).toInt
    val w = hash << p
    val rho = if (w == 0) 65 - p else java.lang.Long.numberOfLeadingZeros(w) + 1
    if (rho > regs(idx)) regs(idx) = rho.toByte
  }

  def mergeInto(into: Array[Byte], from: Array[Byte]): Unit = {
    require(into.length == from.length,
      s"cannot merge HLL sketches of different p: ${into.length} vs ${from.length} registers")
    var i = 0
    while (i < into.length) {
      if (from(i) > into(i)) into(i) = from(i)
      i += 1
    }
  }

  def estimate(regs: Array[Byte]): Double = {
    val m = regs.length
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = regs(i) & 0xff
      sum += 1.0 / java.lang.Math.scalb(1.0, r) // exact 2^-r
      if (r == 0) zeros += 1
      i += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m * m / sum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }

  def registers(bytes: Array[Byte]): ArrayData =
    new GenericArrayData(bytes.map(b => (b & 0xff): Any))

  /** Fresh register-wise max of two sketches (inputs untouched). */
  def merge2(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = a.clone()
    mergeInto(out, b)
    out
  }
}

case class HllSketchAgg(
    child: Expression, p: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hll_sketch expects a LongType hash, got $t")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) HllImpl.update(buf, v.asInstanceOf[Long], p)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    HllImpl.mergeInto(buf, other); buf
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "hll_sketch"

  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = cs.head)
}

case class HllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hll_merge expects a binary sketch, got $t")
  }

  // empty buffer = "no sketch yet": sized lazily from the first input
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val sk = v.asInstanceOf[Array[Byte]]
      if (buf.isEmpty) sk.clone()
      else { HllImpl.mergeInto(buf, sk); buf }
    }
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    if (other.isEmpty) buf
    else if (buf.isEmpty) other.clone()
    else { HllImpl.mergeInto(buf, other); buf }

  override def eval(buf: Array[Byte]): Any = if (buf.isEmpty) null else buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "hll_merge"

  override def withNewMutableAggBufferOffset(o: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): HllMergeAgg =
    copy(child = cs.head)
}

private[functions] trait HllScalarExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected a binary sketch, got $t")
  }
}

case class HllEstimateExpr(child: Expression) extends HllScalarExpr {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    HllImpl.estimate(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HllImpl.estimate($c)")
  override protected def withNewChildInternal(c: Expression): HllEstimateExpr =
    copy(child = c)
}

case class HllRegistersExpr(child: Expression) extends HllScalarExpr {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HllImpl.registers(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HllImpl.registers($c)")
  override protected def withNewChildInternal(c: Expression): HllRegistersExpr =
    copy(child = c)
}

/** Scalar register-wise max of two sketches (codegen'd; inputs
  * untouched, output a fresh buffer).
  */
case class HllMerge2Expr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"hll_merge2 requires two binary sketches, got $t")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    HllImpl.merge2(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HllImpl.merge2($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HllMerge2Expr =
    copy(left = newLeft, right = newRight)
}
