package graft.functions

import org.apache.spark.sql.{Column, GraftExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** Corpus-level MinHash signatures — set-similarity sketches BETWEEN
  * corpora, completing the mergeable sketch suite ([[Hll]] distinct
  * counts, [[Cms]] frequencies, [[Hist]] distributions): "how much
  * does this crawl snapshot / data drop overlap that one" as a
  * signature compare, never a shingle-set join. Broder's classic
  * resemblance estimator (Broder 1997, "On the resemblance and
  * containment of documents") applied at corpus granularity: the
  * signature of a corpus is, per permutation k, the minimum of
  * h_k(x) = a_k*x + b_k over every item hash x in the corpus — the
  * SAME affine family as the per-document [[MinHashSig]], so
  * signatures built by either path are comparable. P(min_A[k] =
  * min_B[k]) = J(A, B), so the fraction of matching slots estimates
  * Jaccard with stderr ~ sqrt(J(1-J)/k).
  *
  * Properties the per-document operator doesn't need but corpus
  * maintenance does:
  *  - mergeable: elementwise signed min ([[corpusMinhashMerge]]) is
  *    associative, commutative, IDEMPOTENT — re-merging a shard is
  *    harmless; persist one signature per shard/day/source and
  *    combine later without re-reading data.
  *  - duplicate-insensitive: min ignores multiplicity, so no DISTINCT
  *    pass is needed over the item stream (set semantics for free).
  *
  * Scale shape: partial-aggregable single pass — the exchange moves
  * k-slot signatures, not items; the pairwise overlap matrix over S
  * corpora is S·k longs driver-side, not an item join.
  *
  * Deterministic signed-integer arithmetic over a caller-supplied
  * 64-bit item hash (pair with [[SimHash.fnv1a64]]), so the
  * `q_corpus_overlap` gate renders all k permutation minima bit-exactly
  * in DuckDB (wrapping multiply in HUGEINT, signed min via a 2^63
  * offset) and pins every slot of every signature pair-wise.
  */
object CorpusSketch {

  /** Aggregate item hashes into a k-slot corpus MinHash signature
    * (array<long>: per-permutation signed minima; empty input =>
    * all Long.MaxValue). 1 <= k <= 512 (the [[MinHashImpl]] family).
    */
  def corpusMinhash(hash: Column, k: Int): Column =
    GraftExpr.column(
      CorpusMinHashAgg(GraftExpr.expression(hash), k).toAggregateExpression())

  /** Union pre-built signatures: elementwise signed min. Mismatched
    * k throws.
    */
  def corpusMinhashMerge(sig: Column): Column =
    GraftExpr.column(
      CorpusSigMergeAgg(GraftExpr.expression(sig)).toAggregateExpression())

  /** Number of matching slots between two signatures (0..k); the
    * Jaccard estimate is `sigMatches(a, b) / k`. Built-in composition
    * (codegen'd): no custom expression needed.
    */
  def sigMatches(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), m => m)).cast("long")

  /** Jaccard resemblance estimate in [0, 1]. */
  def jaccardEstimate(a: Column, b: Column): Column =
    sigMatches(a, b).cast("double") / size(a).cast("double")
}

object CorpusSketchImpl {
  def create(k: Int): Array[Long] = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    mins
  }

  def update(mins: Array[Long], hash: Long): Unit = {
    val as = MinHashImpl.as
    val bs = MinHashImpl.bs
    var k = 0
    while (k < mins.length) {
      val h = as(k) * hash + bs(k)
      if (h < mins(k)) mins(k) = h
      k += 1
    }
  }

  def mergeInto(into: Array[Long], from: Array[Long]): Unit = {
    require(into.length == from.length,
      s"cannot merge corpus signatures of different k: ${into.length} vs ${from.length}")
    var i = 0
    while (i < into.length) {
      if (from(i) < into(i)) into(i) = from(i)
      i += 1
    }
  }

  def serialize(mins: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * mins.length)
    bb.asLongBuffer().put(mins)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }
}

case class CorpusMinHashAgg(
    hash: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(k >= 1 && k <= 512, s"k must be in [1,512], got $k")

  override def checkInputDataTypes(): TypeCheckResult = hash.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"corpus_minhash expects a LongType item hash, got $t")
  }

  override def createAggregationBuffer(): Array[Long] = CorpusSketchImpl.create(k)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = hash.eval(input)
    if (v != null) CorpusSketchImpl.update(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    CorpusSketchImpl.mergeInto(buf, other); buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))
  override def serialize(buf: Array[Long]): Array[Byte] = CorpusSketchImpl.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = CorpusSketchImpl.deserialize(bytes)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hash)
  override def prettyName: String = "corpus_minhash"

  override def withNewMutableAggBufferOffset(o: Int): CorpusMinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CorpusMinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): CorpusMinHashAgg =
    copy(hash = cs.head)
}

case class CorpusSigMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"corpus_minhash_merge expects array<long> signatures, got $t")
  }

  // empty buffer = "no signature yet": sized lazily from the first input
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val sig = v.asInstanceOf[ArrayData].toLongArray()
      if (buf.isEmpty) sig
      else { CorpusSketchImpl.mergeInto(buf, sig); buf }
    }
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    if (other.isEmpty) buf
    else if (buf.isEmpty) other.clone()
    else { CorpusSketchImpl.mergeInto(buf, other); buf }

  override def eval(buf: Array[Long]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf.map(x => x: Any))
  override def serialize(buf: Array[Long]): Array[Byte] = CorpusSketchImpl.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = CorpusSketchImpl.deserialize(bytes)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "corpus_minhash_merge"

  override def withNewMutableAggBufferOffset(o: Int): CorpusSigMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CorpusSigMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): CorpusSigMergeAgg =
    copy(child = cs.head)
}
