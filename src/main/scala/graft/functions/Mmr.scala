package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maximal-Marginal-Relevance re-ranking (Carbonell & Goldstein,
  * SIGIR'98) — the diversity stage between candidate retrieval and
  * serving: greedily pick k results maximizing
  * `λ·rel(d) − (1−λ)·max_{s∈picked} sim(d, s)`, so near-duplicate
  * hits stop crowding out coverage.
  *
  * EXACT-INTEGER domain, deliberately: relevance is a long (an int8
  * dot against the query — the [[Int8]] serving tier's native score)
  * and the pairwise diversity term is the exact integer dot of the
  * candidates' int8 codes, with λ in per-mille — the whole greedy
  * objective is `λm·rel − (1000−λm)·maxSim` in long arithmetic, so
  * the selection is bit-reproducible run-to-run, arrival-order
  * independent (argmax ties break to the lower id — a total order),
  * and DuckDB-oracle-able. Float-vector callers quantize through
  * [[Int8.int8Codes]] first — which is the house serving posture
  * anyway (4× smaller candidate payloads; the measured cosine error
  * envelope is in SCALE.md).
  *
  * Scale shape: candidates arrive FROM a bounded retrieval (an ANN /
  * BM25 top-k'), so the per-query collect_list state is k'·(dim+16)
  * bytes — bounded by construction, like the funnel's step vector.
  * One query-keyed exchange packs the candidates; the greedy select
  * is a codegen'd map-side expression, O(k·k'·dim) integer ops per
  * query, zero further shuffle.
  */
object Mmr {

  /** Re-rank `cands` (one row per (query, candidate) with an integer
    * relevance and an integral-typed vector) to the top `k` per query
    * by greedy MMR. Output: (qCol, rank 1-based, idCol, relCol) —
    * fewer than k rows where a query has fewer candidates.
    */
  def mmrRerank(cands: DataFrame, qCol: String, idCol: String,
      relCol: String, vecCol: String, k: Int,
      lambdaPerMille: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambdaPerMille >= 0 && lambdaPerMille <= 1000,
      s"lambdaPerMille must be in [0, 1000], got $lambdaPerMille")
    val packed = cands.groupBy(col(qCol))
      .agg(collect_list(struct(col(idCol).cast("long").as("id"),
        col(relCol).cast("long").as("rel"),
        col(vecCol).as("vec"))).as("__c"))
    packed.select(col(qCol),
        explode(GraftExpr.column(MmrSelectExpr(
          GraftExpr.expression(col("__c")), k, lambdaPerMille))).as("__s"))
      .select(col(qCol), col("__s.rank").as("rank"),
        col("__s.id").as(idCol), col("__s.rel").as(relCol))
  }
}

/** Greedy MMR selection over one query's packed candidate array.
  * Input: array<struct<id:long, rel:long, vec:array<integral>>>;
  * output: array<struct<rank:int, id:long, rel:long>> in pick order.
  */
case class MmrSelectExpr(child: Expression, k: Int, lambdaPerMille: Int)
  extends UnaryExpression {
  require(k >= 1 && lambdaPerMille >= 0 && lambdaPerMille <= 1000)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("rel", LongType, nullable = false))), containsNull = false)

  private def vecTag: Int = child.dataType match {
    case ArrayType(StructType(fields), _) if fields.length == 3 =>
      fields(2).dataType match {
        case ArrayType(ByteType, _) => 0
        case ArrayType(ShortType, _) => 1
        case ArrayType(IntegerType, _) => 2
        case ArrayType(LongType, _) => 3
        case _ => -1
      }
    case _ => -1
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fields), _) if fields.length == 3 &&
        fields(0).dataType == LongType && fields(1).dataType == LongType &&
        vecTag >= 0 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mmr_select requires array<struct<long, long, array<integral>>>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    MmrImpl.select(input.asInstanceOf[ArrayData], vecTag, k, lambdaPerMille)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MmrImpl.select($c, $vecTag, $k, $lambdaPerMille)")

  override protected def withNewChildInternal(c: Expression): MmrSelectExpr =
    copy(child = c)
}

object MmrImpl {

  private def readVec(a: ArrayData, tag: Int): Array[Long] = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = tag match {
        case 0 => a.getByte(i).toLong
        case 1 => a.getShort(i).toLong
        case 2 => a.getInt(i).toLong
        case _ => a.getLong(i)
      }
      i += 1
    }
    out
  }

  // Overflow-checked (the scaladoc promises EXACT long arithmetic and
  // the type check admits array<int>/array<long> vectors, where a silent
  // wrap would corrupt the ranking): int8 callers never trip this, wide
  // callers get an ArithmeticException instead of a wrong answer.
  private def dot(a: Array[Long], b: Array[Long]): Long = {
    if (a.length != b.length) throw new IllegalArgumentException(
      s"mmr_select: candidate vectors must share one dimension, " +
        s"got ${a.length} vs ${b.length}")
    var s = 0L; var i = 0
    while (i < a.length) {
      s = Math.addExact(s, Math.multiplyExact(a(i), b(i))); i += 1
    }
    s
  }

  /** Greedy selection: step 1 maximizes λm·rel (diversity term 0);
    * each later step maximizes λm·rel − (1000−λm)·max_{picked} dot.
    * Ties break to the lower id, so the result is a pure function of
    * the candidate SET. Exact long arithmetic throughout.
    */
  def select(cands: ArrayData, tag: Int, k: Int, lm: Int): ArrayData = {
    val n = cands.numElements()
    val ids = new Array[Long](n)
    val rels = new Array[Long](n)
    val vecs = new Array[Array[Long]](n)
    var i = 0
    while (i < n) {
      val row = cands.getStruct(i, 3)
      ids(i) = row.getLong(0)
      rels(i) = row.getLong(1)
      vecs(i) = readVec(row.getArray(2), tag)
      i += 1
    }
    val taken = new Array[Boolean](n)
    val maxSim = new Array[Long](n) // valid only once something is picked
    val kk = math.min(k, n)
    val out = new Array[Any](kk)
    var step = 0
    while (step < kk) {
      var best = -1
      var bestObj = Long.MinValue
      var j = 0
      while (j < n) {
        if (!taken(j)) {
          val div = if (step == 0) 0L else maxSim(j)
          val obj = Math.subtractExact(Math.multiplyExact(lm.toLong, rels(j)),
            Math.multiplyExact(1000L - lm, div))
          if (obj > bestObj || (obj == bestObj && (best < 0 || ids(j) < ids(best)))) {
            bestObj = obj; best = j
          }
        }
        j += 1
      }
      taken(best) = true
      out(step) = InternalRow(step + 1, ids(best), rels(best))
      var r = 0
      while (r < n) {
        if (!taken(r)) {
          val d = dot(vecs(r), vecs(best))
          if (step == 0 || d > maxSim(r)) maxSim(r) = d
        }
        r += 1
      }
      step += 1
    }
    new GenericArrayData(out)
  }
}
