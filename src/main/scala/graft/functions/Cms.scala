package graft.functions

import org.apache.spark.sql.{Column, GraftExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Count-Min frequency sketches (Cormode & Muthukrishnan, J.Alg 2005)
  * as first-class MERGEABLE columns — the frequency companion to
  * [[Hll]]'s distinct-count sketch. A training pipeline keeps one
  * token/domain/url frequency sketch per shard or per daily drop and
  * re-merges incrementally: "how often does this n-gram appear across
  * the whole corpus" costs one scan per NEW drop plus a counter-wise
  * sum of persisted sketches, never a re-scan of history. The sketch
  * answers point queries with a one-sided error: estimate >= true
  * count always, and exceeds it by more than eps*TOTAL with
  * probability at most delta, where eps = e/width and
  * delta = exp(-depth).
  *
  * Layout: an 8-byte header (depth, width as big-endian ints) then
  * depth*width big-endian long counters, row-major. Update: for each
  * row j, counter[j][splitmix64(hash XOR j) mod width] += weight. The
  * arithmetic is deterministic integer-only over a caller-supplied
  * 64-bit hash column, so the `q_cms*` gates render the ENTIRE counter
  * grid bit-exactly in DuckDB and hash-compare all depth*width values,
  * not just an estimate.
  *
  * Scale shape: a partial-aggregable single pass — map-side partials
  * build one (8 + 8*d*w)-byte buffer per group per task and the
  * exchange moves sketches, not rows; `cmsMerge` over persisted shard
  * sketches moves only the sketch column. The estimate path broadcasts
  * the one-row sketch and probes it inside a codegen'd projection —
  * no join, no shuffle on the probe side.
  */
object Cms {

  /** Aggregate rows into a depth x width Count-Min sketch (binary).
    * `hash` is a 64-bit hash of the item (pair with
    * [[Sampling.splitmix64]], [[SimHash.fnv1a]] or `xxhash64`);
    * `weight` (LongType) is the occurrence count this row contributes
    * — `lit(1L)` for raw item streams, the count column for
    * pre-aggregated (item, count) relations. Negative weights are the
    * caller's responsibility (they void the one-sided error bound).
    */
  def cmsSketch(hash: Column, weight: Column, depth: Int, width: Int): Column =
    GraftExpr.column(
      CmsSketchAgg(GraftExpr.expression(hash), GraftExpr.expression(weight),
        depth, width).toAggregateExpression())

  /** [[cmsSketch]] with (depth, width) derived from the target error
    * instead of hand-tuned: estimates overshoot true counts by more
    * than `relErr`·TOTAL with probability at most `delta` — width =
    * ceil(e/relErr), depth = ceil(ln(1/delta)). The defaults (0.1%
    * of total mass, 1% failure odds) cost 5 rows × 2719 counters =
    * ~106 KB per group, independent of corpus size — the property
    * that makes the shape safe to fix once for a 100 TB history.
    */
  def cmsSketchAuto(hash: Column, weight: Column,
      relErr: Double = 0.001, delta: Double = 0.01): Column = {
    val (d, w) = autoShape(relErr, delta)
    cmsSketch(hash, weight, d, w)
  }

  /** (depth, width) for a target (relErr, delta) — public so callers
    * building probe-side estimates can size identically.
    */
  def autoShape(relErr: Double, delta: Double): (Int, Int) = {
    require(relErr > 0 && relErr < 1, s"relErr must be in (0,1), got $relErr")
    require(delta > 0 && delta < 1, s"delta must be in (0,1), got $delta")
    (math.ceil(math.log(1.0 / delta)).toInt.max(1),
      math.ceil(math.E / relErr).toInt.max(2))
  }

  /** Union pre-built sketches: counter-wise sum. Associative and
    * commutative (NOT idempotent — merging the same shard twice
    * double-counts, unlike [[Hll.hllMerge]]; dedupe shard ids first).
    * Mismatched (depth, width) throw.
    */
  def cmsMerge(sketch: Column): Column =
    GraftExpr.column(CmsMergeAgg(GraftExpr.expression(sketch)).toAggregateExpression())

  /** Point estimate for one item: min over the depth counters the
    * item's hash touches. Always >= the true count.
    */
  def cmsEstimate(sketch: Column, hash: Column): Column =
    GraftExpr.column(
      CmsEstimateExpr(GraftExpr.expression(sketch), GraftExpr.expression(hash)))

  /** All depth*width counters as array<long>, row-major — the
    * gate/debug view of a sketch.
    */
  def cmsCounters(sketch: Column): Column =
    GraftExpr.column(CmsCountersExpr(GraftExpr.expression(sketch)))

  /** Equi-join cardinality estimate from two same-shape sketches
    * built over the two sides' join-key hashes at weight 1: min over
    * depth rows of the row-wise counter inner product (Cormode &
    * Muthukrishnan's CM inner-product estimator — Σ_k fA(k)·fB(k) IS
    * the join size). Always ≥ the true size, tightening with width.
    * The 100 TB use: size a join from two fist-sized persisted
    * sketches — broadcast thresholds, salting decisions, shuffle
    * budgeting — without scanning either side again. Exact long
    * arithmetic; throws on overflow rather than silently saturating
    * (widen the sketch: per-cell counts shrink with width).
    */
  def cmsJoinSize(a: Column, b: Column): Column =
    GraftExpr.column(
      CmsInnerProductExpr(GraftExpr.expression(a), GraftExpr.expression(b)))
}

object CmsImpl {
  private val HEADER = 8

  def create(depth: Int, width: Int): Array[Byte] = {
    val buf = new Array[Byte](HEADER + 8 * depth * width)
    writeInt(buf, 0, depth)
    writeInt(buf, 4, width)
    buf
  }

  def depth(buf: Array[Byte]): Int = readInt(buf, 0)
  def width(buf: Array[Byte]): Int = readInt(buf, 4)

  def update(buf: Array[Byte], hash: Long, weight: Long): Unit = {
    val d = depth(buf)
    val w = width(buf)
    var j = 0
    while (j < d) {
      val idx = java.lang.Long.remainderUnsigned(
        SamplingImpl.splitmix64(hash ^ j.toLong), w.toLong).toInt
      val off = HEADER + 8 * (j * w + idx)
      writeLong(buf, off, readLong(buf, off) + weight)
      j += 1
    }
  }

  def mergeInto(into: Array[Byte], from: Array[Byte]): Unit = {
    require(into.length == from.length &&
        depth(into) == depth(from) && width(into) == width(from),
      s"cannot merge CMS sketches of different shape: " +
        s"${depth(into)}x${width(into)} vs ${depth(from)}x${width(from)}")
    var off = HEADER
    while (off < into.length) {
      writeLong(into, off, readLong(into, off) + readLong(from, off))
      off += 8
    }
  }

  def estimate(buf: Array[Byte], hash: Long): Long = {
    val d = depth(buf)
    val w = width(buf)
    var min = Long.MaxValue
    var j = 0
    while (j < d) {
      val idx = java.lang.Long.remainderUnsigned(
        SamplingImpl.splitmix64(hash ^ j.toLong), w.toLong).toInt
      val c = readLong(buf, HEADER + 8 * (j * w + idx))
      if (c < min) min = c
      j += 1
    }
    min
  }

  def innerProduct(a: Array[Byte], b: Array[Byte]): Long = {
    val d = depth(a)
    val w = width(a)
    require(d == depth(b) && w == width(b),
      s"cannot inner-product sketches of different shape: " +
        s"$d×$w vs ${depth(b)}×${width(b)}")
    var best = Long.MaxValue
    var j = 0
    while (j < d) {
      var s = 0L
      var i = 0
      while (i < w) {
        val off = HEADER + 8 * (j * w + i)
        s = Math.addExact(s,
          Math.multiplyExact(readLong(a, off), readLong(b, off)))
        i += 1
      }
      if (s < best) best = s
      j += 1
    }
    best
  }

  def counters(buf: Array[Byte]): GenericArrayData = {
    val n = (buf.length - HEADER) / 8
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = readLong(buf, HEADER + 8 * i)
      i += 1
    }
    new GenericArrayData(out)
  }

  private def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def writeInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  private def readLong(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  private def writeLong(b: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { b(off + i) = (v >>> (8 * (7 - i))).toByte; i += 1 }
  }
}

case class CmsSketchAgg(
    hash: Expression, weight: Expression, depthN: Int, widthN: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(depthN >= 1 && depthN <= 16, s"depth must be in [1,16], got $depthN")
  require(widthN >= 2, s"width must be >= 2, got $widthN")

  override def checkInputDataTypes(): TypeCheckResult = (hash.dataType, weight.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (h, w) => TypeCheckResult.TypeCheckFailure(
      s"cms_sketch expects (LongType hash, LongType weight), got ($h, $w)")
  }

  override def createAggregationBuffer(): Array[Byte] = CmsImpl.create(depthN, widthN)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val h = hash.eval(input)
    val w = weight.eval(input)
    if (h != null && w != null)
      CmsImpl.update(buf, h.asInstanceOf[Long], w.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    CmsImpl.mergeInto(buf, other); buf
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hash, weight)
  override def prettyName: String = "cms_sketch"

  override def withNewMutableAggBufferOffset(o: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): CmsSketchAgg =
    copy(hash = cs(0), weight = cs(1))
}

case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"cms_merge expects a binary sketch, got $t")
  }

  // empty buffer = "no sketch yet": shaped lazily from the first input
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val sk = v.asInstanceOf[Array[Byte]]
      if (buf.isEmpty) sk.clone()
      else { CmsImpl.mergeInto(buf, sk); buf }
    }
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    if (other.isEmpty) buf
    else if (buf.isEmpty) other.clone()
    else { CmsImpl.mergeInto(buf, other); buf }

  override def eval(buf: Array[Byte]): Any = if (buf.isEmpty) null else buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "cms_merge"

  override def withNewMutableAggBufferOffset(o: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): CmsMergeAgg =
    copy(child = cs.head)
}

case class CmsEstimateExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"cms_estimate expects (binary sketch, LongType hash), got ($l, $r)")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(sk: Any, h: Any): Any =
    CmsImpl.estimate(sk.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, h) => s"graft.functions.CmsImpl.estimate($s, $h)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsEstimateExpr =
    copy(left = l, right = r)
}

case class CmsInnerProductExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"cms_join_size expects two binary sketches, got ($l, $r)")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    CmsImpl.innerProduct(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CmsImpl.innerProduct($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsInnerProductExpr =
    copy(left = l, right = r)
}

case class CmsCountersExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"cms_counters expects a binary sketch, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    CmsImpl.counters(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CmsImpl.counters($c)")
  override protected def withNewChildInternal(c: Expression): CmsCountersExpr =
    copy(child = c)
}
