package graft.functions

import org.apache.spark.sql.{Column, GraftExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** K-minimum-values sample sketch (Bar-Yossef et al. 2002, "Counting
  * distinct elements in a data stream") — the SAMPLE member of the
  * mergeable sketch suite: the k distinct items with the smallest
  * hashes form a uniform sample of the DISTINCT item population,
  * deterministic (a pure function of the item set — partition order,
  * retries, and AQE re-plans cannot change it), mergeable (k smallest
  * of a union = k smallest of the per-shard k-smallests — idempotent,
  * duplicate-insensitive), and persistable. The training-pipeline
  * use: "show me k exemplar documents/tokens/urls per source per
  * drop" as a per-shard column that later jobs re-merge — eyeball
  * samples that stay STABLE across reruns, where `LIMIT k` and
  * `TABLESAMPLE` change under every shuffle. The same sketch yields
  * the KMV distinct-count estimate ((k-1) / normalized k-th minimum)
  * for free.
  *
  * Determinism under hash collisions: equal hashes keep the smallest
  * payload, so the sketch is a pure function of the (hash, payload)
  * set. All integer/string arithmetic — the `q_kmv` gate renders the
  * full sample in DuckDB (min payload per hash, ORDER BY hash LIMIT
  * k).
  */
object Kmv {

  /** Aggregate (hash, payload) into the k-smallest-hash sample:
    * array<struct<h: long, v: string>> sorted by hash ascending
    * (signed Long order — the same order ORDER BY gives a BIGINT in
    * SQL, so oracles compare directly).
    */
  def kmvSample(hash: Column, payload: Column, k: Int): Column =
    GraftExpr.column(KmvSampleAgg(GraftExpr.expression(hash),
      GraftExpr.expression(payload), k).toAggregateExpression())

  /** Union pre-built samples: k smallest of the union (k from the
    * inputs; mismatched sizes allowed — the result keeps the max
    * observed capacity's semantics only if all inputs share k, so
    * mismatches throw).
    */
  def kmvMerge(sample: Column, k: Int): Column =
    GraftExpr.column(KmvMergeAgg(GraftExpr.expression(sample), k).toAggregateExpression())
}

object KmvImpl {
  type Buf = java.util.TreeMap[Long, UTF8String]

  def insert(buf: Buf, k: Int, h: Long, v: UTF8String): Unit = {
    val prev = buf.get(h)
    if (prev == null) {
      if (buf.size() < k) buf.put(h, v.clone())
      else if (h < buf.lastKey()) { buf.put(h, v.clone()); buf.remove(buf.lastKey()) }
    } else if (v.compareTo(prev) < 0) buf.put(h, v.clone())
  }

  def mergeInto(into: Buf, k: Int, from: Buf): Unit = {
    val it = from.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      insert(into, k, e.getKey, e.getValue)
    }
  }

  def toArrayData(buf: Buf): GenericArrayData = {
    val out = new Array[Any](buf.size())
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(e.getKey, e.getValue)
      i += 1
    }
    new GenericArrayData(out)
  }

  def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      dos.writeLong(e.getKey)
      val b = e.getValue.getBytes
      dos.writeInt(b.length)
      dos.write(b)
    }
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val dis = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = dis.readInt()
    val buf = new Buf
    var i = 0
    while (i < n) {
      val h = dis.readLong()
      val len = dis.readInt()
      val b = new Array[Byte](len)
      dis.readFully(b)
      buf.put(h, UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  val entryType: StructType = StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("v", StringType, nullable = false)))
}

case class KmvSampleAgg(
    hash: Expression, payload: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvImpl.Buf] {

  require(k >= 1 && k <= (1 << 20), s"k must be in [1, 2^20], got $k")

  override def checkInputDataTypes(): TypeCheckResult = (hash.dataType, payload.dataType) match {
    case (LongType, StringType) => TypeCheckResult.TypeCheckSuccess
    case (h, p) => TypeCheckResult.TypeCheckFailure(
      s"kmv_sample expects (LongType hash, StringType payload), got ($h, $p)")
  }

  override def createAggregationBuffer(): KmvImpl.Buf = new KmvImpl.Buf

  override def update(buf: KmvImpl.Buf, input: InternalRow): KmvImpl.Buf = {
    val h = hash.eval(input)
    val v = payload.eval(input)
    if (h != null && v != null)
      KmvImpl.insert(buf, k, h.asInstanceOf[Long], v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: KmvImpl.Buf, other: KmvImpl.Buf): KmvImpl.Buf = {
    KmvImpl.mergeInto(buf, k, other); buf
  }

  override def eval(buf: KmvImpl.Buf): Any = KmvImpl.toArrayData(buf)
  override def serialize(buf: KmvImpl.Buf): Array[Byte] = KmvImpl.serialize(buf)
  override def deserialize(bytes: Array[Byte]): KmvImpl.Buf = KmvImpl.deserialize(bytes)

  override def dataType: DataType = ArrayType(KmvImpl.entryType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hash, payload)
  override def prettyName: String = "kmv_sample"

  override def withNewMutableAggBufferOffset(o: Int): KmvSampleAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSampleAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): KmvSampleAgg =
    copy(hash = cs(0), payload = cs(1))
}

case class KmvMergeAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvImpl.Buf] {

  require(k >= 1 && k <= (1 << 20), s"k must be in [1, 2^20], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if s.length == 2 &&
      s(0).dataType == LongType && s(1).dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv_merge expects array<struct<h: long, v: string>>, got $t")
  }

  override def createAggregationBuffer(): KmvImpl.Buf = new KmvImpl.Buf

  override def update(buf: KmvImpl.Buf, input: InternalRow): KmvImpl.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        val row = arr.getStruct(i, 2)
        KmvImpl.insert(buf, k, row.getLong(0), row.getUTF8String(1))
        i += 1
      }
    }
    buf
  }

  override def merge(buf: KmvImpl.Buf, other: KmvImpl.Buf): KmvImpl.Buf = {
    KmvImpl.mergeInto(buf, k, other); buf
  }

  override def eval(buf: KmvImpl.Buf): Any = KmvImpl.toArrayData(buf)
  override def serialize(buf: KmvImpl.Buf): Array[Byte] = KmvImpl.serialize(buf)
  override def deserialize(bytes: Array[Byte]): KmvImpl.Buf = KmvImpl.deserialize(bytes)

  override def dataType: DataType = ArrayType(KmvImpl.entryType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kmv_merge"

  override def withNewMutableAggBufferOffset(o: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): KmvMergeAgg =
    copy(child = cs.head)
}
