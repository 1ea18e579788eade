package graft.api

import org.apache.spark.sql._
import org.apache.spark.sql.functions.{col, lit}
import graft.operators.{AsofJoin, Ops, RangeJoin, StatefulOps}
import graft.windowing.{Clock, EventClock, Windower, Windowing, WindowLogicOps}

/** Fluent, step-id'd operator facade mirroring the reference's
  * `bytewax.operators` module shape (`op.map("id", up, f)` style —
  * reference pysrc/bytewax/operators/__init__.py). Step ids land in the
  * Flow registry for visualization; the plan itself is Catalyst lineage.
  *
  * A reference user's pipeline
  * {{{
  *   flow = Dataflow("wc")
  *   inp  = op.input("in", flow, FileSource(path))
  *   low  = op.map("lower", inp, str.lower)
  *   keyed= op.key_on("k", low, lambda w: w)
  *   cnt  = op.count_final("count", keyed, lambda w: w)
  *   op.output("out", cnt, sink)
  * }}}
  * transliterates to
  * {{{
  *   val flow  = Flow("wc")
  *   val inp   = ops.input("in", flow, spark, path)
  *   val low   = ops.map("lower", inp, lower(col("value")).as("value"))
  *   val keyed = ops.keyOn("k", low, col("value"))
  *   val cnt   = ops.countFinal("count", keyed)
  *   ops.output("out", cnt, sinkPath)
  * }}}
  */
object ops {

  private def step(flow: Flow, id: String, kind: String, ups: String*)(df: DataFrame): Stream[Row] = {
    flow.record(id, kind, ups)
    Stream(flow.tap(df, id), flow, id)
  }

  def input(id: String, flow: Flow, spark: SparkSession, parquetPath: String): Stream[Row] =
    step(flow, id, "input")(Ops.input(spark, parquetPath))

  def output(id: String, up: Stream[Row], path: String): Unit = {
    up.flow.record(id, "output", Seq(up.stepId))
    Ops.output(up.ds.toDF(), path)
  }

  def map(id: String, up: Stream[Row], cols: Column*): Stream[Row] =
    step(up.flow, id, "map", up.stepId)(Ops.map(up.ds.toDF(), cols: _*))

  def filter(id: String, up: Stream[Row], p: Column): Stream[Row] =
    step(up.flow, id, "filter", up.stepId)(Ops.filter(up.ds.toDF(), p))

  def flatMap(id: String, up: Stream[Row], arrayExpr: Column, as: String, keep: Seq[Column] = Nil): Stream[Row] =
    step(up.flow, id, "flat_map", up.stepId)(Ops.flatMap(up.ds.toDF(), arrayExpr, as, keep))

  def filterMap(id: String, up: Stream[Row], expr: Column, as: String, keep: Seq[Column] = Nil): Stream[Row] =
    step(up.flow, id, "filter_map", up.stepId)(Ops.filterMap(up.ds.toDF(), expr, as, keep))

  def keyOn(id: String, up: Stream[Row], key: Column): Stream[Row] =
    step(up.flow, id, "key_on", up.stepId)(Ops.keyOn(up.ds.toDF(), key))

  def keyRm(id: String, up: Stream[Row]): Stream[Row] =
    step(up.flow, id, "key_rm", up.stepId)(Ops.keyRm(up.ds.toDF()))

  def branch(id: String, up: Stream[Row], p: Column): BranchOut[Row] = {
    up.flow.record(id, "branch", Seq(up.stepId))
    val (t, f) = Ops.branch(up.ds.toDF(), p)
    BranchOut(Stream(t, up.flow, s"$id.trues"), Stream(f, up.flow, s"$id.falses"))
  }

  def merge(id: String, ups: Stream[Row]*): Stream[Row] = {
    ups.head.flow.record(id, "merge", ups.map(_.stepId))
    Stream(Ops.merge(ups.map(_.ds.toDF()): _*), ups.head.flow, id)
  }

  def redistribute(id: String, up: Stream[Row], n: Int = 0): Stream[Row] =
    step(up.flow, id, "redistribute", up.stepId)(Ops.redistribute(up.ds.toDF(), n))

  def inspect(id: String, up: Stream[Row]): Stream[Row] =
    step(up.flow, id, "inspect", up.stepId)(Ops.inspect(up.ds.toDF(), id))

  def countFinal(id: String, up: Stream[Row]): Stream[Row] =
    step(up.flow, id, "count_final", up.stepId)(
      up.ds.toDF().groupBy(col(Ops.KEY)).agg(org.apache.spark.sql.functions.count(lit(1)).as("count")))

  // ---- windowing (reference op.windowing.*) --------------------------

  def foldWindow(id: String, up: Stream[Row], clock: Clock, w: Windower,
      keys: Seq[Column], aggs: Seq[Column]): Stream[Row] =
    step(up.flow, id, "fold_window", up.stepId)(
      Windowing.aggWindow(up.ds.toDF(), clock, w, keys, aggs))

  def collectWindow(id: String, up: Stream[Row], clock: Clock, w: Windower,
      keys: Seq[Column], value: Column): Stream[Row] =
    step(up.flow, id, "collect_window", up.stepId)(
      Windowing.collectWindow(up.ds.toDF(), clock, w, keys, value))

  def countWindow(id: String, up: Stream[Row], clock: Clock, w: Windower,
      keys: Seq[Column]): Stream[Row] =
    step(up.flow, id, "count_window", up.stepId)(
      Windowing.countWindow(up.ds.toDF(), clock, w, keys))

  /** The generic `window` op (reference windowing.py:1254-1338):
    * arbitrary ordered per-(key, window) logic. Output columns:
    * key, win_start, win_end, value.
    */
  def window[V, W, S](id: String, up: Stream[Row], keyCol: String,
      clock: EventClock, w: Windower, tiebreak: Seq[Column],
      extract: Row => V, logic: WindowLogicOps.WindowLogic[V, W, S])(
      implicit outEnc: Encoder[(String, Long, Long, W)]): Stream[Row] =
    step(up.flow, id, "window", up.stepId)(
      WindowLogicOps.windowLogicBatch(up.ds.toDF(), keyCol, clock, w, tiebreak, extract, logic)
        .toDF("key", "win_start", "win_end", "value"))

  // ---- stateful (reference op.stateful_map etc.) ---------------------

  /** Expression-first running aggregate (the stateful_map fast path). */
  def statefulMap(id: String, up: Stream[Row], keyCol: String,
      orderBy: Seq[Column], aggs: (Column, String)*): Stream[Row] =
    step(up.flow, id, "stateful_map", up.stepId)(
      StatefulOps.runningAgg(up.ds.toDF(), keyCol, orderBy, aggs: _*))

  def asofJoin(id: String, left: Stream[Row], right: Stream[Row],
      keys: Seq[(String, String)], leftTime: String, rightTime: String,
      direction: AsofJoin.Direction = AsofJoin.Backward,
      tolerance: Option[Column] = None): Stream[Row] =
    step(left.flow, id, "asof_join", left.stepId, right.stepId)(
      AsofJoin.asof(left.ds.toDF(), right.ds.toDF(), keys, leftTime, rightTime,
        direction, tolerance))

  def rangeJoin(id: String, points: Stream[Row], intervals: Stream[Row],
      point: String, lo: String, hi: String, binWidth: Long = 0L): Stream[Row] =
    step(points.flow, id, "range_join", points.stepId, intervals.stepId)(
      if (binWidth > 0)
        RangeJoin.pointInInterval(points.ds.toDF(), point,
          intervals.ds.toDF(), lo, hi, binWidth)
      else // <= 0: derive the width from axis stats (the measured auto)
        RangeJoin.pointInIntervalAuto(points.ds.toDF(), point,
          intervals.ds.toDF(), lo, hi))

  /** Keyless global as-of (see [[AsofJoin.asofGlobal]]); binWidth <= 0
    * derives the width from axis stats ([[AsofJoin.asofGlobalAuto]]).
    */
  def asofGlobal(id: String, left: Stream[Row], right: Stream[Row],
      leftTime: String, rightTime: String, binWidth: Long = 0L): Stream[Row] =
    step(left.flow, id, "asof_global", left.stepId, right.stepId)(
      if (binWidth > 0)
        AsofJoin.asofGlobal(left.ds.toDF(), leftTime, right.ds.toDF(), rightTime, binWidth)
      else
        AsofJoin.asofGlobalAuto(left.ds.toDF(), leftTime, right.ds.toDF(), rightTime))

  /** Banded edit-distance verify over candidate pairs
    * ([[graft.functions.Dedup.editVerifyPairs]] — the production
    * verify tier; pairs' first two columns are the endpoints).
    */
  def editVerify(id: String, pairs: Stream[Row], docs: Stream[Row],
      idCol: String, textCol: String, maxEdit: Int): Stream[Row] =
    step(pairs.flow, id, "edit_verify", pairs.stepId, docs.stepId)(
      graft.functions.Dedup.editVerifyPairs(pairs.ds.toDF(), docs.ds.toDF(),
        org.apache.spark.sql.functions.col(idCol),
        org.apache.spark.sql.functions.col(textCol), maxEdit))

  /** Keyed event-time interval join — streaming inputs route through
    * Structured Streaming's watermark-bounded symmetric hash join,
    * batch inputs through the identical-predicate single join
    * ([[graft.streaming.StreamingJoin]]).
    */
  def intervalJoin(id: String, left: Stream[Row], right: Stream[Row],
      leftTs: String, rightTs: String, key: String,
      lower: String, upper: String, delay: String,
      joinType: String = "inner"): Stream[Row] =
    step(left.flow, id, "interval_join", left.stepId, right.stepId)(
      if (left.ds.isStreaming || right.ds.isStreaming)
        graft.streaming.StreamingJoin.intervalJoin(left.ds.toDF(), leftTs,
          right.ds.toDF(), rightTs, key, lower, upper, delay, joinType)
      else
        graft.streaming.StreamingJoin.intervalJoinBatch(left.ds.toDF(), leftTs,
          right.ds.toDF(), rightTs, key, lower, upper, joinType))

  // ---- corpus-maintenance steps (beyond-reference surface) ----

  def lineDedup(id: String, up: Stream[Row], idCol: String, textCol: String,
      minCount: Long, delimiter: String = "\n"): Stream[Row] =
    step(up.flow, id, "line_dedup", up.stepId)(
      graft.functions.Text.lineDedup(up.ds.toDF(),
        org.apache.spark.sql.functions.col(idCol),
        org.apache.spark.sql.functions.col(textCol), minCount, delimiter))

  def chunkDocs(id: String, up: Stream[Row], idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): Stream[Row] =
    step(up.flow, id, "chunk_docs", up.stepId)(
      graft.functions.Text.chunkDocs(up.ds.toDF(),
        org.apache.spark.sql.functions.col(idCol),
        org.apache.spark.sql.functions.col(textCol), chunkTokens, stride))

  def snapshotDiff(id: String, oldUp: Stream[Row], newUp: Stream[Row],
      idCol: String, fpCol: String, includeUnchanged: Boolean = false): Stream[Row] =
    step(oldUp.flow, id, "snapshot_diff", oldUp.stepId, newUp.stepId)(
      graft.functions.Dedup.snapshotDiff(oldUp.ds.toDF(), newUp.ds.toDF(),
        idCol, fpCol, includeUnchanged))

  def gopherFilter(id: String, up: Stream[Row], textCol: String,
      stopwords: Seq[String],
      t: graft.functions.Text.GopherThresholds =
        graft.functions.Text.GopherThresholds()): Stream[Row] =
    step(up.flow, id, "gopher_filter", up.stepId)(
      graft.functions.Text.gopherFilter(up.ds.toDF(),
        org.apache.spark.sql.functions.col(textCol), stopwords, t))

  def sourceFilter(id: String, up: Stream[Row], sourceCol: String,
      textCol: String, minMeanTokens: Long,
      minAlphaPerMille: Long): Stream[Row] =
    step(up.flow, id, "source_filter", up.stepId)(
      graft.functions.Text.sourceFilter(up.ds.toDF(), sourceCol,
        org.apache.spark.sql.functions.col(textCol), minMeanTokens,
        minAlphaPerMille))

  def lmScore(id: String, up: Stream[Row], idCol: String, textCol: String,
      model: graft.functions.Text.LmModel, alpha: Double = 0.4): Stream[Row] =
    step(up.flow, id, "lm_score", up.stepId)(
      graft.functions.Text.lmScore(up.ds.toDF(),
        org.apache.spark.sql.functions.col(idCol),
        org.apache.spark.sql.functions.col(textCol), model, alpha))

  def semanticDecontam(id: String, train: Stream[Row], eval: Stream[Row],
      trainId: String, trainVec: String, evalId: String, evalVec: String,
      threshold: Double, targetBucket: Int = 64, tables: Int = 8): Stream[Row] =
    step(train.flow, id, "semantic_decontam", train.stepId, eval.stepId)(
      graft.functions.Dedup.decontaminateSemanticAuto(train.ds.toDF(),
        trainId, trainVec, eval.ds.toDF(), evalId, evalVec,
        threshold, targetBucket, tables))

  def perplexityFilter(id: String, up: Stream[Row], textCol: String,
      model: graft.functions.LmFused.LmBroadcastModel,
      maxPpl: Double): Stream[Row] =
    step(up.flow, id, "perplexity_filter", up.stepId)(
      graft.functions.LmFused.perplexityFilter(up.ds.toDF(),
        org.apache.spark.sql.functions.col(textCol), model, maxPpl))

  def recordLink(id: String, up: Stream[Row], idCol: String,
      blocks: Seq[Column], payload: Seq[Column],
      score: (Column, Column) => Column, minScore: Column,
      maxBlockSize: Int = 10000): Stream[Row] =
    step(up.flow, id, "record_link", up.stepId)(
      graft.functions.RecordLink.linkPairs(up.ds.toDF(),
        org.apache.spark.sql.functions.col(idCol), blocks, payload,
        score, minScore, maxBlockSize))

  def recordLinkAgainst(id: String, probe: Stream[Row], ref: Stream[Row],
      probeId: String, refId: String, blocks: Seq[Column],
      payload: Seq[Column], score: (Column, Column) => Column,
      minScore: Column, maxBlockSize: Int = 10000): Stream[Row] =
    step(probe.flow, id, "record_link_against", probe.stepId, ref.stepId)(
      graft.functions.RecordLink.linkAgainst(probe.ds.toDF(),
        org.apache.spark.sql.functions.col(probeId), ref.ds.toDF(),
        org.apache.spark.sql.functions.col(refId), blocks, payload,
        score, minScore, maxBlockSize))

  def classifierFilter(id: String, up: Stream[Row], idCol: String,
      textCol: String, model: graft.functions.Classify.NbModel,
      label: String, minMargin: Double = 0.0): Stream[Row] =
    step(up.flow, id, "classifier_filter", up.stepId)(
      graft.functions.Classify.classifierFilter(up.ds.toDF(),
        org.apache.spark.sql.functions.col(idCol),
        org.apache.spark.sql.functions.col(textCol), model, label, minMargin))

  def classifierFilterFused(id: String, up: Stream[Row], textCol: String,
      model: graft.functions.Classify.NbBroadcastModel, label: String,
      minMargin: Double = 0.0): Stream[Row] =
    step(up.flow, id, "classifier_filter_fused", up.stepId)(
      graft.functions.Classify.classifierFilterFused(up.ds.toDF(),
        org.apache.spark.sql.functions.col(textCol), model, label, minMargin))

  def nbPredict(id: String, up: Stream[Row], idCol: String, textCol: String,
      model: graft.functions.Classify.NbModel): Stream[Row] =
    step(up.flow, id, "nb_predict", up.stepId)(
      graft.functions.Classify.nbPredict(up.ds.toDF(),
        org.apache.spark.sql.functions.col(idCol),
        org.apache.spark.sql.functions.col(textCol), model))

  // target default matches Multimodal.nearDupAssets and
  // StreamingDedup.nearDupAssets (49 → 48-bit sigs): the SAME logical
  // operator must produce the SAME signatures from every API layer,
  // or mixed batch/stream pipelines silently stop colocating
  def assetNearDup(id: String, up: Stream[Row], idCol: String, blobCol: String,
      target: Int = 49, maxHamming: Int = 6): Stream[Row] =
    step(up.flow, id, "asset_near_dup", up.stepId)(
      graft.functions.Multimodal.nearDupAssets(up.ds.toDF(), idCol, blobCol,
        target, maxHamming))

  def bm25TopK(id: String, queries: Stream[Row],
      index: graft.functions.Search.SearchIndex, qidCol: String,
      qtextCol: String, k: Int, k1: Double = 1.2, b: Double = 0.75): Stream[Row] =
    step(queries.flow, id, "bm25_top_k", queries.stepId)(
      graft.functions.Search.bm25TopK(index, queries.ds.toDF(),
        org.apache.spark.sql.functions.col(qidCol),
        org.apache.spark.sql.functions.col(qtextCol), k, k1, b))

  def rrfFuse(id: String, a: Stream[Row], b: Stream[Row], k: Int,
      k0: Int = 60): Stream[Row] =
    step(a.flow, id, "rrf_fuse", a.stepId, b.stepId)(
      graft.functions.Search.rrfFuse(a.ds.toDF(), b.ds.toDF(), k, k0))

  def clusterBalancedSample(id: String, up: Stream[Row], idCol: String,
      vecCol: String, centroids: DataFrame, perCluster: Int,
      seed: Long = 0L): Stream[Row] =
    step(up.flow, id, "cluster_balanced_sample", up.stepId)(
      graft.functions.Sampling.clusterBalancedSample(up.ds.toDF(), idCol,
        vecCol, centroids, perCluster, seed))

  def temperatureMix(id: String, up: Stream[Row], idCol: String,
      stratumCol: String, alpha: Double, targetTotal: Long,
      salt: Long = 0L): Stream[Row] =
    step(up.flow, id, "temperature_mix", up.stepId)(
      graft.functions.Sampling.temperatureMix(up.ds.toDF(),
        org.apache.spark.sql.functions.col(idCol),
        org.apache.spark.sql.functions.col(stratumCol), alpha, targetTotal, salt))

  def saltedJoin(id: String, fact: Stream[Row], dim: Stream[Row],
      keys: Seq[String], salt: Int = 16, joinType: String = "inner"): Stream[Row] =
    step(fact.flow, id, "salted_join", fact.stepId, dim.stepId)(
      graft.operators.SkewJoin.saltedJoin(fact.ds.toDF(), dim.ds.toDF(),
        keys, salt, joinType))

  def bloomReduceJoin(id: String, probe: Stream[Row], build: Stream[Row],
      keys: Seq[String], joinType: String = "inner",
      fpp: Double = 0.01): Stream[Row] =
    step(probe.flow, id, "bloom_reduce_join", probe.stepId, build.stepId)(
      graft.operators.BloomJoin.bloomReduceJoin(probe.ds.toDF(),
        build.ds.toDF(), keys, joinType, fpp))

  def upsert(id: String, base: Stream[Row], changes: Stream[Row],
      keyCol: String, deleteCol: Option[String] = None): Stream[Row] =
    step(base.flow, id, "upsert", base.stepId, changes.stepId)(
      graft.functions.Maintain.upsert(base.ds.toDF(), changes.ds.toDF(),
        keyCol, deleteCol))

  def refreshAgg(id: String, prevAgg: Stream[Row], base: Stream[Row],
      changes: Stream[Row], keyCol: String, groupCols: Seq[String],
      aggs: Seq[org.apache.spark.sql.Column],
      deleteCol: Option[String] = None): Stream[Row] =
    step(base.flow, id, "refresh_agg", prevAgg.stepId, base.stepId, changes.stepId)(
      graft.functions.Maintain.refreshAgg(prevAgg.ds.toDF(), base.ds.toDF(),
        changes.ds.toDF(), keyCol, groupCols, aggs, deleteCol))

  def scd2Apply(id: String, history: Stream[Row], changes: Stream[Row],
      keyCol: String, attrCols: Seq[String],
      changeTsCol: String): Stream[Row] =
    step(history.flow, id, "scd2_apply", history.stepId, changes.stepId)(
      graft.functions.Maintain.scd2Apply(history.ds.toDF(),
        changes.ds.toDF(), keyCol, attrCols, changeTsCol))

  def scd2AsOf(id: String, history: Stream[Row], asOfTs: Long): Stream[Row] =
    step(history.flow, id, "scd2_as_of", history.stepId)(
      graft.functions.Maintain.scd2AsOf(history.ds.toDF(), asOfTs))

  def validateReport(id: String, up: Stream[Row],
      checks: Seq[graft.functions.Validate.Check]): Stream[Row] =
    step(up.flow, id, "validate_report", up.stepId)(
      graft.functions.Validate.report(up.ds.toDF(), checks))

  def groupSplit(id: String, up: Stream[Row], groupCol: String,
      fractions: Seq[(String, Double)], salt: Long = 0L): Stream[Row] =
    step(up.flow, id, "group_split", up.stepId)(
      graft.functions.Sampling.groupSplit(up.ds.toDF(),
        org.apache.spark.sql.functions.col(groupCol), fractions, salt))

  def profileBy(id: String, up: Stream[Row], stratumCol: String,
      cols: Seq[String], exactDistinct: Boolean = false): Stream[Row] =
    step(up.flow, id, "profile_by", up.stepId)(
      graft.functions.Profile.profileBy(up.ds.toDF(),
        org.apache.spark.sql.functions.col(stratumCol), cols, exactDistinct))

  def noveltyStats(id: String, train: Stream[Row], ref: Stream[Row],
      idCol: String, textCol: String, n: Int): Stream[Row] =
    step(train.flow, id, "novelty_stats", train.stepId, ref.stepId)(
      graft.functions.Dedup.noveltyStats(train.ds.toDF(),
        org.apache.spark.sql.functions.col(idCol),
        org.apache.spark.sql.functions.col(textCol),
        ref.ds.toDF(), org.apache.spark.sql.functions.col(textCol), n))

  def normalizeText(id: String, up: Stream[Row], textCol: String,
      lowercase: Boolean = true, stripPunct: Boolean = true,
      foldDigits: Boolean = false): Stream[Row] =
    step(up.flow, id, "normalize_text", up.stepId)(
      up.ds.toDF().withColumn(textCol,
        graft.functions.Text.normalize(
          org.apache.spark.sql.functions.col(textCol),
          lowercase, stripPunct, foldDigits)))

  def hardNegatives(id: String, candidates: Stream[Row],
      positives: Stream[Row], k: Int): Stream[Row] =
    step(candidates.flow, id, "hard_negatives", candidates.stepId,
      positives.stepId)(
      graft.functions.Similarity.hardNegatives(candidates.ds.toDF(),
        positives.ds.toDF(), k))

  def annRecall(id: String, approx: Stream[Row],
      exact: Stream[Row]): Stream[Row] =
    step(approx.flow, id, "ann_recall", approx.stepId, exact.stepId)(
      graft.functions.Similarity.annRecall(approx.ds.toDF(), exact.ds.toDF()))

  def mmrRerank(id: String, candidates: Stream[Row], qCol: String,
      idCol: String, relCol: String, vecCol: String, k: Int,
      lambdaPerMille: Int): Stream[Row] =
    step(candidates.flow, id, "mmr_rerank", candidates.stepId)(
      graft.functions.Mmr.mmrRerank(candidates.ds.toDF(), qCol, idCol,
        relCol, vecCol, k, lambdaPerMille))

  def curateBest(id: String, up: Stream[Row], idCol: String,
      textCol: String, stopwords: Seq[String], minQuality: Double,
      n: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.5, maxBucketSize: Int = -1): Stream[Row] =
    step(up.flow, id, "curate_best", up.stepId)(
      graft.functions.Dedup.curateClusteredBest(up.ds.toDF(),
        org.apache.spark.sql.functions.col(idCol),
        org.apache.spark.sql.functions.col(textCol),
        stopwords, minQuality, n, numHashes, bands, threshold, maxBucketSize))

  def clusterCards(id: String, assign: Stream[Row], meta: Stream[Row],
      idCol: String, cidCol: String, metaIdCol: String,
      byCol: String): Stream[Row] =
    step(assign.flow, id, "cluster_cards", assign.stepId, meta.stepId)(
      graft.functions.Profile.clusterCards(assign.ds.toDF(), idCol, cidCol,
        meta.ds.toDF(), metaIdCol,
        org.apache.spark.sql.functions.col(byCol)))

  def pageRank(id: String, edges: Stream[Row], iterations: Int,
      dampingPermille: Int = 850): Stream[Row] =
    step(edges.flow, id, "page_rank", edges.stepId)(
      graft.functions.Graph.pageRank(edges.ds.toDF(), iterations,
        dampingPermille))

  def trustRank(id: String, edges: Stream[Row], seeds: Stream[Row],
      iterations: Int, dampingPermille: Int = 850): Stream[Row] =
    step(edges.flow, id, "trust_rank", edges.stepId, seeds.stepId)(
      graft.functions.Graph.trustRank(edges.ds.toDF(), seeds.ds.toDF(),
        iterations, dampingPermille))

  def hits(id: String, edges: Stream[Row], iterations: Int): Stream[Row] =
    step(edges.flow, id, "hits", edges.stepId)(
      graft.functions.Graph.hits(edges.ds.toDF(), iterations))

  def labelPropagation(id: String, edges: Stream[Row],
      iterations: Int): Stream[Row] =
    step(edges.flow, id, "label_propagation", edges.stepId)(
      graft.functions.Graph.labelPropagation(edges.ds.toDF(), iterations))

  def degrees(id: String, edges: Stream[Row]): Stream[Row] =
    step(edges.flow, id, "degrees", edges.stepId)(
      graft.functions.Graph.degrees(edges.ds.toDF()))

  def bfsDistance(id: String, edges: Stream[Row], seeds: Stream[Row],
      maxDepth: Int): Stream[Row] =
    step(edges.flow, id, "bfs_distance", edges.stepId, seeds.stepId)(
      graft.functions.Graph.bfsDistance(edges.ds.toDF(), seeds.ds.toDF(),
        maxDepth))

  def pageRankWeighted(id: String, edges: Stream[Row], iterations: Int,
      dampingPermille: Int = 850): Stream[Row] =
    step(edges.flow, id, "page_rank_weighted", edges.stepId)(
      graft.functions.Graph.pageRankWeighted(edges.ds.toDF(), iterations,
        dampingPermille))

  def sssp(id: String, edges: Stream[Row], seeds: Stream[Row],
      maxIter: Int = 50): Stream[Row] =
    step(edges.flow, id, "sssp", edges.stepId, seeds.stepId)(
      graft.functions.Graph.sssp(edges.ds.toDF(), seeds.ds.toDF(), maxIter))

  def harmonicCentrality(id: String, edges: Stream[Row], maxRadius: Int,
      p: Int = 12): Stream[Row] =
    step(edges.flow, id, "harmonic_centrality", edges.stepId)(
      graft.functions.Graph.harmonicCentrality(edges.ds.toDF(), maxRadius, p))

  def linCentrality(id: String, edges: Stream[Row], maxRadius: Int,
      p: Int = 12): Stream[Row] =
    step(edges.flow, id, "lin_centrality", edges.stepId)(
      graft.functions.Graph.linCentrality(edges.ds.toDF(), maxRadius, p))

  def attribution(id: String, events: Stream[Row], userCol: String,
      tsCol: String, typeCol: String, idCol: String, channelCol: String,
      convType: String, touchTypes: Seq[String], lookbackUs: Long,
      model: String = "linear"): Stream[Row] =
    step(events.flow, id, "attribution", events.stepId)(
      graft.functions.Events.attribution(events.ds.toDF(), userCol, tsCol,
        typeCol, idCol, channelCol, convType, touchTypes, lookbackUs, model))

  def proximityDocs(id: String, postings: Stream[Row], terms: Seq[String],
      windowTokens: Long): Stream[Row] =
    step(postings.flow, id, "proximity_docs", postings.stepId)(
      graft.functions.Search.proximityDocs(postings.ds.toDF(), terms,
        windowTokens))

  def funnel(id: String, events: Stream[Row], userCol: String,
      tsCol: String, typeCol: String, steps: Seq[String],
      maxSpanUs: Option[Long] = None): Stream[Row] =
    step(events.flow, id, "funnel", events.stepId)(
      graft.functions.Events.funnel(events.ds.toDF(), userCol, tsCol,
        typeCol, steps, maxSpanUs))

  def cohortRetention(id: String, events: Stream[Row], userCol: String,
      tsCol: String, bucketUs: Long): Stream[Row] =
    step(events.flow, id, "cohort_retention", events.stepId)(
      graft.functions.Events.cohortRetention(events.ds.toDF(), userCol,
        tsCol, bucketUs))

  def sessionize(id: String, events: Stream[Row], userCol: String,
      tsCol: String, gapUs: Long): Stream[Row] =
    step(events.flow, id, "sessionize", events.stepId)(
      graft.functions.Events.sessionize(events.ds.toDF(), userCol,
        tsCol, gapUs))

  def transitions(id: String, events: Stream[Row], userCol: String,
      tsCol: String, typeCol: String,
      tieBreak: Seq[String] = Nil): Stream[Row] =
    step(events.flow, id, "transitions", events.stepId)(
      graft.functions.Events.transitions(events.ds.toDF(), userCol,
        tsCol, typeCol, tieBreak))

  def anomalies(id: String, events: Stream[Row], groupCol: String,
      valueCol: String, k: Long, unitScale: Long = 1L): Stream[Row] =
    step(events.flow, id, "anomalies", events.stepId)(
      graft.functions.Events.anomalies(events.ds.toDF(), groupCol,
        valueCol, k, unitScale))

  def cusum(id: String, events: Stream[Row], userCol: String,
      tsCol: String, valueCol: String, ref: Long, threshold: Long,
      tieBreak: Seq[String] = Nil): Stream[Row] =
    step(events.flow, id, "cusum", events.stepId)(
      graft.functions.Events.cusum(events.ds.toDF(), userCol, tsCol,
        valueCol, ref, threshold, tieBreak))

  def resampleLocf(id: String, events: Stream[Row], userCol: String,
      tsCol: String, valueCol: String, stepUs: Long,
      tieBreak: Seq[String] = Nil): Stream[Row] =
    step(events.flow, id, "resample_locf", events.stepId)(
      graft.functions.Events.resampleLocf(events.ds.toDF(), userCol,
        tsCol, valueCol, stepUs, tieBreak))
}
