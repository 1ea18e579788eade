package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused zero-shuffle serving tier for the CCNet-style bigram LM
  * ([[Text.lmScore]]) — the [[Classify.nbPredictFused]] pattern
  * applied to perplexity filtering: the count RELATIONS collapse
  * into driver-side hash tables (Zipf-bounded — vocabulary + seen
  * bigrams, never corpus-sized) and scoring becomes ONE codegen'd
  * scan per document: tokenize, look up, accumulate. No explode, no
  * joins, no exchange — and being a pure stateless projection it is
  * ALSO the streaming perplexity filter (no state store, no
  * foreachBatch).
  *
  * The relational [[Text.lmScore]] stays the scale-default when the
  * bigram table outgrows a comfortable broadcast; parity between the
  * two is spec-pinned (identical hit counts, ll to 1e-9).
  */
object LmFused {

  /** [[Text.LmModel]] materialized for the fused scan. Bigram keys
    * are "p t" — a space can never appear inside a token.
    */
  // values are BOXED java.lang.Long: with a primitive value type,
  // Java's null-on-miss would silently unbox to 0L and the null check
  // below could never fire (log(0) = −Inf instead of backoff)
  final case class LmBroadcastModel(uni: java.util.HashMap[String, java.lang.Long],
      bi: java.util.HashMap[String, java.lang.Long], totalTokens: Long,
      alpha: Double) extends Serializable

  /** Collect the count relations (bounded by vocabulary/seen-bigram
    * size — the same Zipf argument as the BPE vocabulary curve).
    */
  def broadcastModel(model: Text.LmModel, alpha: Double = 0.4): LmBroadcastModel = {
    val uni = new java.util.HashMap[String, java.lang.Long]()
    model.unigrams.collect().foreach(r =>
      uni.put(r.getString(0), Long.box(r.getLong(1))))
    val bi = new java.util.HashMap[String, java.lang.Long]()
    model.bigrams.collect().foreach(r =>
      bi.put(r.getString(0) + " " + r.getString(1), Long.box(r.getLong(2))))
    LmBroadcastModel(uni, bi, model.totalTokens, alpha)
  }

  /** struct(n_scored, n_backoff, ll, ppl) in one scan — the
    * [[Text.lmScore]] per-doc row. Docs under 2 tokens produce
    * n_scored = 0 and null ll/ppl (the relational path emits no row
    * for them; spec-pinned divergence, same as the fused NB).
    */
  def lmScoreFusedCol(text: Column, model: LmBroadcastModel): Column =
    GraftExpr.column(LmScoreExpr(GraftExpr.expression(text), model))

  /** [[Text.lmScore]]'s frame shape on the fused path: (id, n_scored,
    * n_backoff, ll, ppl), batch or streaming.
    */
  def lmScoreFused(df: DataFrame, idCol: Column, text: Column,
      model: LmBroadcastModel): DataFrame = {
    val s = lmScoreFusedCol(text, model)
    df.select(idCol.as("id"),
      s.getField("n_scored").as("n_scored"),
      s.getField("n_backoff").as("n_backoff"),
      s.getField("ll").as("ll"),
      s.getField("ppl").as("ppl"))
      .filter(col("n_scored") > 0)
  }

  /** The CCNet keep-rule as one scan predicate: keep docs with
    * ppl ≤ maxPpl (docs under 2 tokens kept — nothing to score).
    * Stateless; runs on streams unchanged.
    */
  def perplexityFilter(df: DataFrame, text: Column,
      model: LmBroadcastModel, maxPpl: Double): DataFrame = {
    val s = lmScoreFusedCol(text, model)
    // null text scores null — unscorable docs (null, empty, single
    // token) are KEPT uniformly; perplexity only cuts what it can read
    df.filter(s.isNull || s.getField("n_scored") === 0L ||
      s.getField("ppl") <= maxPpl)
  }
}

object LmFusedImpl {
  /** One pass: tokenize ([[TokenScanImpl.isWs]] semantics), then per
    * bigram position the stupid-backoff score exactly as
    * [[Text.lmScore]] computes it — seen (p,t) with a unigram row for
    * p → ln c2 − ln c1(p); else ln α + ln max(c1(t), 1) − ln N.
    */
  def score(model: LmFused.LmBroadcastModel, s: UTF8String): InternalRow = {
    val str = s.toString
    var prev: String = null
    var nScored = 0L
    var nBackoff = 0L
    var ll = 0.0
    var start = -1
    var i = 0
    while (i <= str.length) {
      val ws = i == str.length || TokenScanImpl.isWs(str.charAt(i))
      if (!ws && start < 0) start = i
      else if (ws && start >= 0) {
        val tok = str.substring(start, i)
        if (prev != null) {
          nScored += 1
          val c2 = model.bi.get(prev + " " + tok)
          val c1p = model.uni.get(prev)
          if (c2 != null && c1p != null) {
            ll += math.log(c2.doubleValue()) - math.log(c1p.doubleValue())
          } else {
            nBackoff += 1
            val c1t = model.uni.get(tok)
            val c = if (c1t == null) 1L else math.max(c1t.longValue(), 1L)
            ll += math.log(model.alpha) + math.log(c.toDouble) -
              math.log(model.totalTokens.toDouble)
          }
        }
        prev = tok
        start = -1
      }
      i += 1
    }
    val (llOut, pplOut): (Any, Any) =
      if (nScored == 0) (null, null)
      else (Double.box(ll), Double.box(math.exp(-ll / nScored)))
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nScored, nBackoff, llOut, pplOut))
  }
}

/** Fused stupid-backoff LM scoring over a text column —
  * struct(n_scored, n_backoff, ll, ppl) in one codegen'd scan.
  */
case class LmScoreExpr(child: Expression, model: LmFused.LmBroadcastModel)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_scored", LongType, nullable = false),
    StructField("n_backoff", LongType, nullable = false),
    StructField("ll", DoubleType, nullable = true),
    StructField("ppl", DoubleType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"lm_score requires string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    LmFusedImpl.score(model, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lmModel", model,
      "graft.functions.LmFused.LmBroadcastModel")
    defineCodeGen(ctx, ev, c => s"graft.functions.LmFusedImpl.score($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): LmScoreExpr =
    copy(child = newChild)
}
