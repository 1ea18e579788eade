package graft.functions

import org.apache.spark.sql.{Column, GraftExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fixed-grid histograms as first-class MERGEABLE columns — the
  * distribution member of the sketch suite ([[Hll]] distinct counts,
  * [[Cms]] frequencies, [[CorpusSketch]] overlap). The corpus
  * statistic a training pipeline tracks per shard/day/source:
  * document-length, token-count, and quality-score distributions,
  * persisted per drop and re-merged incrementally — approximate
  * quantiles over a 100 TB corpus's full history cost one scan per
  * NEW drop plus a counter-wise sum (`histMerge`), never a re-sort of
  * history (exact `percentile` sorts every group member every run).
  *
  * Layout: array<long> of nbins+2 counters over a caller-fixed
  * [lo, hi) grid — slot 0 underflows (v < lo), slot nbins+1 overflows
  * (v >= hi), slot 1+i covers bin i. Bin index is
  * floor((v-lo) * nbins / (hi-lo)) with each step IEEE-correctly
  * rounded in both engines when written in the same operation order,
  * so the `q_hist` gate renders every counter and the quantile-bin
  * scan bit-exactly in DuckDB. A fixed grid (vs t-digest/KLL) trades
  * adaptive resolution for determinism, idempotent-safe merges, and
  * O(1) codegen'd updates — the right trade when the pipeline owner
  * knows the value range (lengths, scores, timestamps) and the
  * estimate must be reproducible across reruns and engines.
  *
  * Quantile error is bounded by bin width: the true q-quantile lies
  * in the returned bin (assuming no under/overflow mass), so err <=
  * (hi-lo)/nbins absolute. Scale shape: partial-aggregable single
  * pass; the exchange moves (nbins+2)-slot arrays, not rows.
  */
object Hist {

  /** Aggregate a DoubleType value column into an (nbins+2)-slot
    * histogram over [lo, hi). NaNs are skipped (counted nowhere).
    */
  def histSketch(value: Column, lo: Double, hi: Double, nbins: Int): Column =
    GraftExpr.column(
      HistAgg(GraftExpr.expression(value), lo, hi, nbins).toAggregateExpression())

  /** Union pre-built histograms: counter-wise sum (associative,
    * commutative; NOT idempotent — dedupe shard ids first, as with
    * [[Cms.cmsMerge]]). Mismatched slot counts throw.
    */
  def histMerge(hist: Column): Column =
    GraftExpr.column(HistMergeAgg(GraftExpr.expression(hist)).toAggregateExpression())

  /** The slot (0..nbins+1) containing the q-quantile: the first slot
    * at which the running count reaches ceil(q * total) (min 1).
    * Integer-exact — the gate's quantile surface. Returns -1 for an
    * all-empty histogram.
    */
  def histQuantileSlot(hist: Column, q: Double): Column =
    GraftExpr.column(HistQuantileSlotExpr(GraftExpr.expression(hist), q))

  /** Quantile estimate as a value: linear interpolation inside the
    * quantile slot, clamped to [lo, hi]. Under/overflow mass resolves
    * to lo / hi. Double arithmetic — use [[histQuantileSlot]] when
    * cross-engine bit-exactness matters.
    */
  def histQuantileValue(hist: Column, q: Double, lo: Double, hi: Double, nbins: Int): Column =
    GraftExpr.column(
      HistQuantileValueExpr(GraftExpr.expression(hist), q, lo, hi, nbins))
}

object HistImpl {
  def binIndex(v: Double, lo: Double, hi: Double, nbins: Int): Int =
    if (v < lo) 0
    else if (v >= hi) nbins + 1
    else {
      // same operation order as the SQL render: (v-lo) * nbins / (hi-lo)
      val i = math.floor((v - lo) * nbins / (hi - lo)).toInt
      // fp guard: v just below hi can round to nbins
      1 + (if (i >= nbins) nbins - 1 else i)
    }

  def update(counts: Array[Long], v: Double, lo: Double, hi: Double, nbins: Int): Unit =
    if (!java.lang.Double.isNaN(v)) counts(binIndex(v, lo, hi, nbins)) += 1

  def mergeInto(into: Array[Long], from: Array[Long]): Unit = {
    require(into.length == from.length,
      s"cannot merge histograms of different shape: ${into.length} vs ${from.length} slots")
    var i = 0
    while (i < into.length) { into(i) += from(i); i += 1 }
  }

  def quantileSlot(counts: ArrayData, q: Double): Int = {
    val n = counts.numElements()
    var total = 0L
    var i = 0
    while (i < n) { total += counts.getLong(i); i += 1 }
    if (total == 0L) return -1
    val target = math.max(1L, math.ceil(q * total).toLong)
    var cum = 0L
    i = 0
    while (i < n) {
      cum += counts.getLong(i)
      if (cum >= target) return i
      i += 1
    }
    n - 1
  }

  def quantileValue(counts: ArrayData, q: Double, lo: Double, hi: Double, nbins: Int): Double = {
    val slot = quantileSlot(counts, q)
    if (slot < 0) return Double.NaN
    if (slot == 0) return lo
    if (slot == nbins + 1) return hi
    var total = 0L
    var i = 0
    val n = counts.numElements()
    while (i < n) { total += counts.getLong(i); i += 1 }
    val target = math.max(1L, math.ceil(q * total).toLong)
    var cumBefore = 0L
    i = 0
    while (i < slot) { cumBefore += counts.getLong(i); i += 1 }
    val inBin = counts.getLong(slot).toDouble
    val frac = (target - cumBefore).toDouble / inBin
    val w = (hi - lo) / nbins
    lo + w * ((slot - 1).toDouble + frac)
  }
}

case class HistAgg(
    value: Expression, lo: Double, hi: Double, nbins: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(nbins >= 1 && nbins <= (1 << 20), s"nbins must be in [1, 2^20], got $nbins")
  require(lo < hi, s"need lo < hi, got [$lo, $hi)")

  override def checkInputDataTypes(): TypeCheckResult = value.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hist_sketch expects a DoubleType value, got $t")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nbins + 2)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = value.eval(input)
    if (v != null) HistImpl.update(buf, v.asInstanceOf[Double], lo, hi, nbins)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    HistImpl.mergeInto(buf, other); buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.map(x => x: Any))
  override def serialize(buf: Array[Long]): Array[Byte] = CorpusSketchImpl.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = CorpusSketchImpl.deserialize(bytes)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(value)
  override def prettyName: String = "hist_sketch"

  override def withNewMutableAggBufferOffset(o: Int): HistAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HistAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): HistAgg =
    copy(value = cs.head)
}

case class HistMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hist_merge expects array<long> histograms, got $t")
  }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val h = v.asInstanceOf[ArrayData].toLongArray()
      if (buf.isEmpty) h
      else { HistImpl.mergeInto(buf, h); buf }
    }
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    if (other.isEmpty) buf
    else if (buf.isEmpty) other.clone()
    else { HistImpl.mergeInto(buf, other); buf }

  override def eval(buf: Array[Long]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf.map(x => x: Any))
  override def serialize(buf: Array[Long]): Array[Byte] = CorpusSketchImpl.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = CorpusSketchImpl.deserialize(bytes)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "hist_merge"

  override def withNewMutableAggBufferOffset(o: Int): HistMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HistMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): HistMergeAgg =
    copy(child = cs.head)
}

private[functions] trait HistScalarExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected an array<long> histogram, got $t")
  }
}

case class HistQuantileSlotExpr(child: Expression, q: Double) extends HistScalarExpr {
  require(q >= 0.0 && q <= 1.0, s"q must be in [0,1], got $q")
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    HistImpl.quantileSlot(input.asInstanceOf[ArrayData], q)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HistImpl.quantileSlot($c, $q)")
  override protected def withNewChildInternal(c: Expression): HistQuantileSlotExpr =
    copy(child = c)
}

case class HistQuantileValueExpr(
    child: Expression, q: Double, lo: Double, hi: Double, nbins: Int)
  extends HistScalarExpr {
  require(q >= 0.0 && q <= 1.0, s"q must be in [0,1], got $q")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    HistImpl.quantileValue(input.asInstanceOf[ArrayData], q, lo, hi, nbins)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HistImpl.quantileValue($c, $q, $lo, $hi, $nbins)")
  override protected def withNewChildInternal(c: Expression): HistQuantileValueExpr =
    copy(child = c)
}
