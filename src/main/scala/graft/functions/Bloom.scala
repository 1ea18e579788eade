package graft.functions

import org.apache.spark.sql.{Column, GraftExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bloom filters as first-class MERGEABLE columns — the set-membership
  * member of the sketch suite ([[Hll]] distinct counts, [[Cms]]
  * frequencies, [[CorpusSketch]] overlap, [[Hist]] distributions).
  * The corpus-maintenance shape: persist one filter of seen
  * urls/doc-fingerprints per shard or daily drop, OR them together
  * (associative, commutative, IDEMPOTENT — re-merging a shard is
  * harmless), and probe new arrivals map-side — "have we crawled this
  * before" across a 100 TB history without touching it.
  *
  * Spark's `stat.bloomFilter` / `BloomFilterMightContain` (used by
  * [[Dedup.decontaminateBloom]]) covers the one-shot build-and-probe
  * case; this variant makes the filter a VALUE: buildable as a grouped
  * aggregate (one filter per source/day in one pass), mergeable as an
  * aggregate over persisted filters, probe-able via a codegen'd
  * expression — and its bit layout is deterministic integer arithmetic
  * over a caller-supplied 64-bit hash (bit_j = splitmix64(h XOR j) mod
  * m), so the `q_bloom` gate renders every set bit in DuckDB.
  *
  * False-positive rate ≈ (1 - e^(-k·n/m))^k; m/n = 10 bits/key at k=3
  * gives ~0.9%. No false negatives. Layout: 8-byte header (m bits, k
  * as big-endian ints) + ceil(m/8) bytes, bit i = byte i>>3, mask
  * 1<<(i&7).
  */
object Bloom {

  /** Aggregate item hashes into an m-bit, k-hash Bloom filter
    * (binary). m must be a multiple of 8.
    */
  def bloomSketch(hash: Column, m: Int, k: Int): Column =
    GraftExpr.column(
      BloomSketchAgg(GraftExpr.expression(hash), m, k).toAggregateExpression())

  /** [[bloomSketch]] sized from the expected key count and target
    * false-positive rate: m = -n·ln(fpp)/ln²2 rounded up to bytes,
    * k = round(m/n·ln2) — the textbook optimum (the same formula
    * Spark's `stat.bloomFilter` uses). n is EXPECTED keys — an
    * estimate (e.g. a prior drop's [[Hll]] count) is fine; overshoot
    * just pads fpp.
    */
  def bloomSketchAuto(hash: Column, expectedKeys: Long, fpp: Double = 0.01): Column = {
    val (m, k) = autoShape(expectedKeys, fpp)
    bloomSketch(hash, m, k)
  }

  /** (m bits, k hashes) for (expectedKeys, fpp) — public so probe
    * sides can size identically.
    */
  def autoShape(expectedKeys: Long, fpp: Double): (Int, Int) = {
    require(expectedKeys > 0, s"expectedKeys must be > 0, got $expectedKeys")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val ln2 = math.log(2.0)
    val mRaw = math.ceil(-expectedKeys * math.log(fpp) / (ln2 * ln2))
    val m = math.min((((mRaw.toLong + 7) / 8) * 8).max(8L), 1L << 30).toInt
    val k = math.max(1, math.round(m.toDouble / expectedKeys * ln2).toInt).min(16)
    (m, k)
  }

  /** Union pre-built filters: bitwise OR. Mismatched (m, k) throw. */
  def bloomMerge(sketch: Column): Column =
    GraftExpr.column(BloomMergeAgg(GraftExpr.expression(sketch)).toAggregateExpression())

  /** Membership probe: true iff all k bit positions for `hash` are
    * set. No false negatives; false positives at the sizing rate.
    */
  def bloomContains(sketch: Column, hash: Column): Column =
    GraftExpr.column(
      BloomContainsExpr(GraftExpr.expression(sketch), GraftExpr.expression(hash)))

  /** Sorted set-bit positions as array<int> — the gate/debug view. */
  def bloomBits(sketch: Column): Column =
    GraftExpr.column(BloomBitsExpr(GraftExpr.expression(sketch)))
}

object BloomImpl {
  private val HEADER = 8

  def create(m: Int, k: Int): Array[Byte] = {
    val buf = new Array[Byte](HEADER + m / 8)
    buf(0) = (m >>> 24).toByte; buf(1) = (m >>> 16).toByte
    buf(2) = (m >>> 8).toByte; buf(3) = m.toByte
    buf(4) = (k >>> 24).toByte; buf(5) = (k >>> 16).toByte
    buf(6) = (k >>> 8).toByte; buf(7) = k.toByte
    buf
  }

  def mBits(buf: Array[Byte]): Int =
    ((buf(0) & 0xff) << 24) | ((buf(1) & 0xff) << 16) | ((buf(2) & 0xff) << 8) | (buf(3) & 0xff)
  def kHashes(buf: Array[Byte]): Int =
    ((buf(4) & 0xff) << 24) | ((buf(5) & 0xff) << 16) | ((buf(6) & 0xff) << 8) | (buf(7) & 0xff)

  def update(buf: Array[Byte], hash: Long): Unit = {
    val m = mBits(buf)
    val k = kHashes(buf)
    var j = 0
    while (j < k) {
      val bit = java.lang.Long.remainderUnsigned(
        SamplingImpl.splitmix64(hash ^ j.toLong), m.toLong).toInt
      buf(HEADER + (bit >> 3)) = (buf(HEADER + (bit >> 3)) | (1 << (bit & 7))).toByte
      j += 1
    }
  }

  def mergeInto(into: Array[Byte], from: Array[Byte]): Unit = {
    require(into.length == from.length &&
        mBits(into) == mBits(from) && kHashes(into) == kHashes(from),
      s"cannot merge bloom filters of different shape: " +
        s"${mBits(into)}/${kHashes(into)} vs ${mBits(from)}/${kHashes(from)}")
    var i = HEADER
    while (i < into.length) { into(i) = (into(i) | from(i)).toByte; i += 1 }
  }

  def contains(buf: Array[Byte], hash: Long): Boolean = {
    val m = mBits(buf)
    val k = kHashes(buf)
    var j = 0
    while (j < k) {
      val bit = java.lang.Long.remainderUnsigned(
        SamplingImpl.splitmix64(hash ^ j.toLong), m.toLong).toInt
      if ((buf(HEADER + (bit >> 3)) & (1 << (bit & 7))) == 0) return false
      j += 1
    }
    true
  }

  def bits(buf: Array[Byte]): GenericArrayData = {
    val m = mBits(buf)
    val out = Vector.newBuilder[Any]
    var i = 0
    while (i < m) {
      if ((buf(HEADER + (i >> 3)) & (1 << (i & 7))) != 0) out += i
      i += 1
    }
    new GenericArrayData(out.result().toArray)
  }
}

case class BloomSketchAgg(
    hash: Expression, m: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(m >= 8 && m % 8 == 0 && m <= (1 << 30), s"m must be a multiple of 8 in [8, 2^30], got $m")
  require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")

  override def checkInputDataTypes(): TypeCheckResult = hash.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bloom_sketch expects a LongType hash, got $t")
  }

  override def createAggregationBuffer(): Array[Byte] = BloomImpl.create(m, k)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = hash.eval(input)
    if (v != null) BloomImpl.update(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    BloomImpl.mergeInto(buf, other); buf
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hash)
  override def prettyName: String = "bloom_sketch"

  override def withNewMutableAggBufferOffset(o: Int): BloomSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): BloomSketchAgg =
    copy(hash = cs.head)
}

case class BloomMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bloom_merge expects a binary filter, got $t")
  }

  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val sk = v.asInstanceOf[Array[Byte]]
      if (buf.isEmpty) sk.clone()
      else { BloomImpl.mergeInto(buf, sk); buf }
    }
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    if (other.isEmpty) buf
    else if (buf.isEmpty) other.clone()
    else { BloomImpl.mergeInto(buf, other); buf }

  override def eval(buf: Array[Byte]): Any = if (buf.isEmpty) null else buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "bloom_merge"

  override def withNewMutableAggBufferOffset(o: Int): BloomMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): BloomMergeAgg =
    copy(child = cs.head)
}

case class BloomContainsExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains expects (binary filter, LongType hash), got ($l, $r)")
  }
  override def dataType: DataType = BooleanType
  override def nullSafeEval(sk: Any, h: Any): Any =
    BloomImpl.contains(sk.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, h) => s"graft.functions.BloomImpl.contains($s, $h)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomContainsExpr =
    copy(left = l, right = r)
}

case class BloomBitsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bloom_bits expects a binary filter, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    BloomImpl.bits(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BloomImpl.bits($c)")
  override protected def withNewChildInternal(c: Expression): BloomBitsExpr =
    copy(child = c)
}
