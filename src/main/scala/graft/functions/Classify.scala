package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Model-based document classification as RELATIONS — the
  * FineWeb-Edu / DCLM-style curation step the rule filters
  * ([[Text.gopherRules]]) and the LM scorer ([[Text.lmScore]]) don't
  * cover: a trained classifier that labels or scores every document
  * (domain routing, educational-quality gating, language ID beyond
  * the stopword vote).
  *
  * The model is a multinomial Naive Bayes over whitespace tokens
  * (the fastText-tier linear baseline those pipelines actually
  * deploy at crawl scale), and like [[Text.LmModel]] it lives
  * entirely as count RELATIONS: a per-class relation (label, n_docs,
  * n_tok) and a per-(label, token) count relation. Nothing
  * corpus-sized ever reaches the driver; the relations persist as
  * parquet and join distributively, so the same model trains on one
  * corpus and scores any number of later drops.
  *
  * Scale shape of scoring: one token explode of the scored corpus
  * collapsed immediately to per-doc term frequencies (map-side
  * partial — repeated tokens combine BEFORE the k-class fanout),
  * one k-row broadcast fanout, one broadcast hash join against the
  * vocabulary-sized word relation, one per-(doc, class) aggregation.
  * The only corpus-sized exchanges carry (id, token, tf) and
  * (id, label) rows — never text.
  */
object Classify {

  /** Multinomial NB model as relations.
    *
    * @param classes   (label, n_docs: long, n_tok: long) — one row per class
    * @param words     (label, t, c: long) — token counts per class
    * @param totalDocs Σ n_docs (bounded scalar fit, [[Text.lmTrain]] precedent)
    * @param vocabSize distinct tokens across classes (the add-one
    *                  smoothing denominator's V)
    */
  final case class NbModel(classes: DataFrame, words: DataFrame,
      totalDocs: Long, vocabSize: Long)

  /** Train [[NbModel]]: one token explode with two hash aggregations
    * (map-side partials) + two bounded scalar aggregates. Labels come
    * from a column, so "training data" is just any labeled corpus
    * slice — a human-rated sample, a distilled LLM rating, an
    * existing lang column.
    */
  def nbTrain(df: DataFrame, labelCol: Column, text: Column): NbModel = {
    // null-labeled rows are ignored (they'd otherwise become a null
    // CLASS in the relational path and NPE the broadcast collect)
    val tok = df.filter(labelCol.isNotNull)
      .select(labelCol.as("label"), Text.tokens(text).as("w"))
    val words = tok.select(col("label"), explode(col("w")).as("t"))
      .groupBy("label", "t").agg(count(lit(1)).as("c"))
    val classes = tok.groupBy("label").agg(
      count(lit(1)).as("n_docs"),
      sum(size(col("w")).cast("long")).as("n_tok"))
    val totals = classes.agg(sum(col("n_docs")), count(lit(1))).collect()(0)
    val vocab = words.select(col("t")).distinct().count()
    NbModel(classes, words, totals.getLong(0), vocab)
  }

  /** Per-(doc, class) smoothed log-likelihood:
    * ll(d, l) = ln(n_docs_l / totalDocs)
    *          + Σ_t tf(d,t) · ln((c(l,t) + 1) / (n_tok_l + V)).
    * Docs with zero tokens produce no row (the [[Text.lmScore]]
    * under-2-token precedent). Output: (id, label, n_pos, n_hit, ll).
    */
  def nbScore(df: DataFrame, idCol: Column, text: Column,
      model: NbModel): DataFrame = {
    val j = scoreJoin(df, idCol, text, model)
    j.groupBy(col("id"), col("label")).agg(
      sum(col("tf")).as("n_pos"),
      sum(when(col("c").isNotNull, col("tf")).otherwise(0L)).as("n_hit"),
      (first(col("lprior")) + sum(col("tf").cast("double") *
        (log(coalesce(col("c"), lit(0L)).cast("double") + lit(1.0)) -
          log(col("n_tok").cast("double") + lit(model.vocabSize.toDouble)))))
        .as("ll"))
  }

  /** The exact-integer face of [[nbScore]] for cross-engine pinning:
    * per (doc, class), the count sums that fully determine every
    * model lookup — n_pos = Σ tf, n_hit = Σ tf over vocabulary hits,
    * sum_c = Σ tf·c(l,t) — plus the class constants. The ln()s stay
    * spec-side (libm last-ulp, the q_text_tfidf / q_text_lm
    * precedent).
    */
  def nbScoreCounts(df: DataFrame, idCol: Column, text: Column,
      model: NbModel): DataFrame = {
    val j = scoreJoin(df, idCol, text, model)
    j.groupBy(col("id"), col("label")).agg(
      sum(col("tf")).as("n_pos"),
      sum(when(col("c").isNotNull, col("tf")).otherwise(0L)).as("n_hit"),
      sum(col("tf") * coalesce(col("c"), lit(0L))).as("sum_c"),
      first(col("n_docs")).as("class_docs"),
      first(col("n_tok")).as("class_tok"))
  }

  /** argmax over [[nbScore]]: (id, label_pred, ll, margin) where
    * margin = ll_best − ll_runnerUp (null for single-class models).
    * Exact-equal scores tie-break on label descending (struct max) so
    * re-runs are deterministic.
    */
  def nbPredict(df: DataFrame, idCol: Column, text: Column,
      model: NbModel): DataFrame = {
    val scored = nbScore(df, idCol, text, model)
    val byScore = struct(col("ll"), col("label"))
    scored.groupBy(col("id")).agg(
      max(byScore).as("best"),
      count(lit(1)).as("k"),
      sort_array(collect_list(col("ll")), asc = false).as("lls"))
      .select(col("id"),
        col("best.label").as("label_pred"),
        col("best.ll").as("ll"),
        when(col("k") > 1, col("best.ll") - element_at(col("lls"), 2))
          .as("margin"))
  }

  /** Keep only documents the model assigns `label` with
    * margin ≥ minMargin — the FineWeb-Edu-style classifier gate
    * (e.g. label = "hi" quality class, margin as confidence).
    */
  def classifierFilter(df: DataFrame, idCol: Column, text: Column,
      model: NbModel, label: String, minMargin: Double = 0.0): DataFrame = {
    val keep = nbPredict(df, idCol, text, model)
      .filter(col("label_pred") === label &&
        coalesce(col("margin"), lit(Double.MaxValue)) >= minMargin)
      .select(col("id").as("__keep_id"))
    df.join(keep, idCol === col("__keep_id"), "left_semi")
  }

  /** Shared scoring join: per-doc term frequencies × k classes, left
    * join against the word relation. tf collapse happens BEFORE the
    * class fanout, so the shuffled row count is distinct tokens per
    * doc, not positions × k.
    */
  private def scoreJoin(df: DataFrame, idCol: Column, text: Column,
      model: NbModel): DataFrame = {
    val tf = df.select(idCol.as("id"), explode(Text.tokens(text)).as("t"))
      .groupBy("id", "t").agg(count(lit(1)).as("tf"))
    val classes = model.classes.select(col("label"), col("n_docs"), col("n_tok"),
      (log(col("n_docs").cast("double")) -
        lit(math.log(model.totalDocs.toDouble))).as("lprior"))
    tf.crossJoin(broadcast(classes))
      .join(broadcast(model.words), Seq("label", "t"), "left")
  }

  // ── zero-shuffle fused path ────────────────────────────────────────

  /** The relational model materialized as a driver-side scoring
    * table for the ZERO-SHUFFLE path: token → per-label
    * ln((c+1)/(n_tok_l+V)), plus per-label priors and unseen-token
    * floors. Bounded by the VOCABULARY (Zipf-shaped, the measured
    * BPE-training curve), not the corpus — the [[nbTrain]] count
    * relations stay the scale-default; this is the serving-optimized
    * face for when the table fits comfortably in a broadcast
    * (~vocab × k × 8 bytes).
    */
  final case class NbBroadcastModel(labels: Array[String],
      priors: Array[Double], floors: Array[Double],
      table: java.util.HashMap[String, Array[Double]]) extends Serializable {
    def k: Int = labels.length
  }

  /** Collect the count relations into an [[NbBroadcastModel]]
    * (labels ascending; a bounded model fit like [[Text.lmTrain]]'s
    * total — vocabulary-sized, never corpus-sized).
    */
  def broadcastModel(model: NbModel): NbBroadcastModel = {
    val cls = model.classes.orderBy(col("label"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val labels = cls.map(_._1)
    val idx = labels.zipWithIndex.toMap
    val priors = cls.map { case (_, nd, _) =>
      math.log(nd.toDouble) - math.log(model.totalDocs.toDouble) }
    val denom = cls.map { case (_, _, nt) =>
      math.log(nt.toDouble + model.vocabSize.toDouble) }
    val floors = denom.map(d => -d) // ln(1) − ln(n_tok_l + V)
    val table = new java.util.HashMap[String, Array[Double]]()
    model.words.collect().foreach { r =>
      val (label, t, c) = (r.getString(0), r.getString(1), r.getLong(2))
      val row = table.computeIfAbsent(t, _ => floors.clone())
      val i = idx(label)
      row(i) = math.log(c.toDouble + 1.0) - denom(i)
    }
    NbBroadcastModel(labels, priors, floors, table)
  }

  /** Fused per-doc prediction — struct(label_pred, ll, margin) from
    * ONE codegen'd text scan ([[NbPredictExpr]]): tokenize, look up,
    * and argmax without any exchange. A pure stateless projection, so
    * it runs UNCHANGED on streaming DataFrames (the streaming
    * classify path — no foreachBatch, no state store). Ties break on
    * label descending like [[nbPredict]]; margin is null for k = 1;
    * zero-token docs score prior-only here (the relational path
    * emits no row for them — its join has nothing to hang one on).
    */
  def nbPredictFusedCol(text: Column, model: NbBroadcastModel): Column = {
    val raw = GraftExpr.column(
      NbPredictExpr(GraftExpr.expression(text), model))
    struct(
      element_at(typedLit(model.labels.toSeq), raw.getField("label_idx") + 1)
        .as("label_pred"),
      raw.getField("ll").as("ll"),
      raw.getField("margin").as("margin"))
  }

  /** [[nbPredict]]'s frame shape on the fused path: (id, label_pred,
    * ll, margin), batch or streaming.
    */
  def nbPredictFused(df: DataFrame, idCol: Column, text: Column,
      model: NbBroadcastModel): DataFrame = {
    val p = nbPredictFusedCol(text, model)
    df.select(idCol.as("id"), p.getField("label_pred").as("label_pred"),
      p.getField("ll").as("ll"), p.getField("margin").as("margin"))
      // null text → null struct; no row, matching the relational path
      .filter(col("label_pred").isNotNull)
  }

  /** [[classifierFilter]] on the fused path: one scan predicate, no
    * joins — composes with parquet pushdown and runs on streams.
    */
  def classifierFilterFused(df: DataFrame, text: Column,
      model: NbBroadcastModel, label: String,
      minMargin: Double = 0.0): DataFrame = {
    val p = nbPredictFusedCol(text, model)
    df.filter(p.getField("label_pred") === label &&
      coalesce(p.getField("margin"), lit(Double.MaxValue)) >= minMargin)
  }
}

object ClassifyImpl {
  /** One fused scan: tokenize ([[TokenScanImpl.isWs]] whitespace
    * semantics), accumulate per-label log-likelihoods from the
    * broadcast table, argmax with label-descending tie-break (labels
    * are sorted ascending, so a tie resolves to the LARGEST index —
    * the struct-max behavior of the relational nbPredict).
    */
  def predict(model: Classify.NbBroadcastModel, s: UTF8String): InternalRow = {
    val k = model.k
    val acc = model.priors.clone()
    val str = s.toString
    var start = -1
    var i = 0
    while (i <= str.length) {
      val ws = i == str.length || TokenScanImpl.isWs(str.charAt(i))
      if (!ws && start < 0) start = i
      else if (ws && start >= 0) {
        val row = model.table.get(str.substring(start, i))
        val add = if (row == null) model.floors else row
        var l = 0
        while (l < k) { acc(l) += add(l); l += 1 }
        start = -1
      }
      i += 1
    }
    var best = 0
    var l = 1
    while (l < k) { if (acc(l) >= acc(best)) best = l; l += 1 }
    var second = Double.NegativeInfinity
    l = 0
    while (l < k) { if (l != best && acc(l) > second) second = acc(l); l += 1 }
    val margin: Any = if (k > 1) Double.box(acc(best) - second) else null
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](best, acc(best), margin))
  }
}

/** Fused NB prediction over a text column —
  * struct(label_idx, ll, margin) in one codegen'd scan; the broadcast
  * model rides into generated code as a plan reference object (the
  * [[PqEncodeExpr]] pattern).
  */
case class NbPredictExpr(child: Expression, model: Classify.NbBroadcastModel)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("label_idx", IntegerType, nullable = false),
    StructField("ll", DoubleType, nullable = false),
    StructField("margin", DoubleType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nb_predict requires string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    ClassifyImpl.predict(model, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nbModel", model,
      "graft.functions.Classify.NbBroadcastModel")
    defineCodeGen(ctx, ev, c => s"graft.functions.ClassifyImpl.predict($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NbPredictExpr =
    copy(child = newChild)
}
