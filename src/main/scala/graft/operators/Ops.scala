package graft.operators

import org.apache.spark.sql._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.api.{BranchOut, Flow, Stream}

/** Stateless operator surface — the analogues of the reference's core +
  * derived stateless operators (reference: pysrc/bytewax/operators/
  * __init__.py §map/filter/flat_map/... and src/operators.rs for the
  * core `flat_map_batch`/`branch`/`merge`/`redistribute`).
  *
  * Design: every operator has a Column-expression form (codegen'd by
  * Catalyst — the preferred path at scale) and, where the reference
  * semantics are lambda-shaped, a typed lambda form. The expression
  * forms keep predicate pushdown / column pruning / whole-stage codegen
  * intact; the lambda forms match the reference API 1:1.
  */
object Ops {

  /** Conventional key column for keyed streams — the analogue of the
    * reference's `KeyedStream[V] = Stream[Tuple[str, V]]`
    * (reference: pysrc/bytewax/operators/__init__.py:77-78).
    */
  val KEY = "key"

  // ---------------------------------------------------------------------
  // core: input / output (reference: operators/__init__.py:240-289,449-494)
  // ---------------------------------------------------------------------

  /** Batch input from parquet (the engine's native bulk source). */
  def input(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Output to parquet (bulk sink; streaming sinks live in graft.connectors). */
  def output(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).parquet(path)

  // ---------------------------------------------------------------------
  // core: flat_map_batch (reference: src/operators.rs:122-228) — THE
  // stateless primitive. Spark analogue: Dataset.mapPartitions.
  // ---------------------------------------------------------------------

  def flatMapBatch[T, U: Encoder](ds: Dataset[T])(f: Iterator[T] => Iterator[U]): Dataset[U] =
    ds.mapPartitions(f)

  // ---------------------------------------------------------------------
  // derived stateless (reference: operators/__init__.py:1460-2606)
  // ---------------------------------------------------------------------

  /** map — 1→1 (reference: operators/__init__.py:2497-2554).
    * Expression form: a pure projection (codegen'd, prunable).
    */
  def map(df: DataFrame, cols: Column*): DataFrame = df.select(cols: _*)

  def mapTyped[T, U: Encoder](ds: Dataset[T])(f: T => U): Dataset[U] = ds.map(f)

  /** filter (reference: operators/__init__.py:1652-1723). */
  def filter(df: DataFrame, predicate: Column): DataFrame = df.filter(predicate)

  def filterTyped[T](ds: Dataset[T])(p: T => Boolean): Dataset[T] = ds.filter(p)

  /** flat_map — 1→many (reference: operators/__init__.py:1460-1523).
    * Expression form: explode of a produced array (stays in codegen).
    */
  def flatMap(df: DataFrame, arrayExpr: Column, as: String, keep: Seq[Column] = Nil): DataFrame =
    df.select(keep :+ explode(arrayExpr).as(as): _*)

  def flatMapTyped[T, U: Encoder](ds: Dataset[T])(f: T => IterableOnce[U]): Dataset[U] =
    ds.flatMap(f)

  /** flatten — Stream[Iterable[X]] → Stream[X] (reference:
    * operators/__init__.py:1593-1649). On a DataFrame the iterable is an
    * array column.
    */
  def flatten(df: DataFrame, arrayCol: String, as: String, keep: Seq[Column] = Nil): DataFrame =
    df.select(keep :+ explode(col(arrayCol)).as(as): _*)

  /** filter_map — map then drop nulls (reference: operators/__init__.py:1790-1857).
    * Expression form: any expr evaluating to null is dropped.
    */
  def filterMap(df: DataFrame, expr: Column, as: String, keep: Seq[Column] = Nil): DataFrame =
    df.select(keep :+ expr.as(as): _*).filter(col(as).isNotNull)

  def filterMapTyped[T, U: Encoder](ds: Dataset[T])(f: T => Option[U]): Dataset[U] =
    ds.flatMap(t => f(t).iterator)

  // ---------------------------------------------------------------------
  // keyed-stream plumbing (reference: operators/__init__.py:2375-2494)
  // ---------------------------------------------------------------------

  /** key_on — attach a string key (reference: operators/__init__.py:2375-2436).
    * The reference enforces `str` keys; we cast to StringType to match.
    */
  def keyOn(df: DataFrame, keyExpr: Column): DataFrame =
    df.withColumn(KEY, keyExpr.cast(StringType))

  /** key_rm (reference: operators/__init__.py:2439-2494). */
  def keyRm(df: DataFrame): DataFrame = df.drop(KEY)

  /** map_value (reference: operators/__init__.py:2557-2606). */
  def mapValue(df: DataFrame, valueCol: String, expr: Column): DataFrame =
    df.withColumn(valueCol, expr)

  /** filter_value (reference: operators/__init__.py:1726-1787). */
  def filterValue(df: DataFrame, predicate: Column): DataFrame = df.filter(predicate)

  /** filter_map_value (reference: operators/__init__.py:1860-1920). */
  def filterMapValue(df: DataFrame, valueCol: String, expr: Column): DataFrame =
    df.withColumn(valueCol, expr).filter(col(valueCol).isNotNull)

  /** flat_map_value (reference: operators/__init__.py:1526-1590). */
  def flatMapValue(df: DataFrame, valueCol: String, arrayExpr: Column): DataFrame = {
    val others = df.columns.filterNot(_ == valueCol).map(col).toSeq
    df.select(others :+ explode(arrayExpr).as(valueCol): _*)
  }

  // ---------------------------------------------------------------------
  // core: branch / merge / redistribute
  // ---------------------------------------------------------------------

  /** branch — split by predicate (reference: operators/__init__.py:119-176,
    * src/operators.rs:34-100). Both sides share one upstream *logical*
    * plan, but when both are materialized separately Catalyst reuses
    * exchanges, not scans — at 100 TB that is two reads of the input.
    * Mitigations, in preference order: (a) fold the split into one pass
    * with conditional aggregation (`when(pred, ...)` — what q_branch
    * itself does); (b) `df.persist()` before branching when both sides
    * feed further work; (c) write the split once with
    * `partitionBy(pred)` and read the halves. The reference shares one
    * in-flight stream so this cost is Spark-specific — hence documented
    * here rather than hidden.
    */
  def branch(df: DataFrame, predicate: Column): (DataFrame, DataFrame) =
    (df.filter(predicate), df.filter(!coalesce(predicate, lit(false))))

  def branchStream[T](s: Stream[T], id: String)(p: Column): BranchOut[T] = {
    s.flow.record(id, "branch", Seq(s.stepId))
    BranchOut(
      Stream(s.ds.filter(p), s.flow, s"$id.trues"),
      Stream(s.ds.filter(!coalesce(p, lit(false))), s.flow, s"$id.falses"))
  }

  /** merge — union N streams (reference: operators/__init__.py:394-446,
    * src/operators.rs:319-343). Column-name-based union to be robust to
    * projection order.
    */
  def merge(dfs: DataFrame*): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = false))

  /** redistribute — break skew with a round-robin shuffle (reference:
    * operators/__init__.py:497-590, src/operators.rs:345-361).
    */
  def redistribute(df: DataFrame, numPartitions: Int = 0): DataFrame =
    if (numPartitions > 0) df.repartition(numPartitions) else df.repartition()

  // ---------------------------------------------------------------------
  // inspect / inspect_debug (reference: operators/__init__.py:296-339,
  // 2021-2069; src/operators.rs:230-317)
  // ---------------------------------------------------------------------

  /** inspect — observe a stream without consuming it. Spark-first: uses
    * `Dataset.observe` (driver-side metrics via QueryExecutionListener /
    * StreamingQueryListener) instead of a per-item side effect, so the
    * plan stays fully codegen'd. `metrics` defaults to a row count.
    */
  def inspect(df: DataFrame, name: String, metrics: Seq[Column] = Nil): DataFrame = {
    val ms = if (metrics.nonEmpty) metrics else Seq(count(lit(1)).as(s"${name}_rows"))
    df.observe(name, ms.head, ms.tail: _*)
  }

  /** inspect_debug — per-item printing observer for debugging (matches the
    * reference's stdout inspector). Not for hot paths: breaks codegen.
    */
  def inspectDebug[T](ds: Dataset[T], stepId: String)(implicit enc: Encoder[T]): Dataset[T] =
    ds.map { x => println(s"$stepId: $x"); x }

  /** raises — crash on any item (reference: operators/__init__.py:2745-2780). */
  def raises[T](ds: Dataset[T], stepId: String)(implicit enc: Encoder[T]): Dataset[T] =
    ds.map { x =>
      throw new RuntimeException(s"raises($stepId): got item $x"); x
    }

  // ---------------------------------------------------------------------
  // enrich_cached (reference: operators/__init__.py:1275-1457)
  // ---------------------------------------------------------------------

  /** enrich_cached — per-executor TTL-cached lookup against an external
    * getter (reference `TTLCache`, operators/__init__.py:1275-1358).
    * The getter runs at most once per key per TTL per executor; results
    * are attached as a new column. For *static* enrichment tables prefer
    * [[enrichBroadcast]] — a broadcast hash join that stays in codegen.
    */
  def enrichCached[T, K, V](ds: Dataset[T], ttlMillis: Long)(keyFn: T => K, getter: K => V)(
      mapper: (T, V) => T)(implicit enc: Encoder[T]): Dataset[T] = {
    // one cache per operator instance, shared across this executor's
    // tasks — the id travels in the closure so two enrichCached steps
    // never mix entries even with identical TTLs
    val cacheId = java.util.UUID.randomUUID().toString
    ds.mapPartitions { it =>
      val cache = TtlCache.instance[K, V](cacheId, ttlMillis)
      it.map { t =>
        val k = keyFn(t)
        mapper(t, cache.getOrFetch(k, () => getter(k)))
      }
    }
  }

  /** Static-dimension enrichment: broadcast join (the 100 TB-scale path
    * for what the reference does with a per-worker cache over a small
    * reference table).
    */
  def enrichBroadcast(df: DataFrame, dim: DataFrame, keys: Seq[String], joinType: String = "left"): DataFrame =
    df.join(broadcast(dim), keys, joinType)

  /** Lens update of a nested struct field — the analogue of the
    * reference's `operators.helpers.map_dict_value`
    * (pysrc/bytewax/operators/helpers.py:9-79): transform one field of
    * a struct-valued column in place, leaving siblings untouched.
    */
  def mapField(df: DataFrame, structCol: String, field: String, f: Column => Column): DataFrame =
    df.withColumn(structCol, col(structCol).withField(field, f(col(s"$structCol.$field"))))

  /** Salted two-phase aggregation for skewed keys: partial aggregation
    * on (key, salt) spreads a hot key over `saltBuckets` tasks, then a
    * tiny final aggregation merges the partials. Use when one key
    * dominates a `groupBy` (AQE splits skewed *joins* but not skewed
    * aggregations). `aggs` must be algebraic (sum/count/min/max) —
    * `partial` and `fin` describe the two phases.
    */
  def saltedAgg(df: DataFrame, keyCol: String, saltBuckets: Int,
      partial: Seq[Column], fin: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(keyCol))
      .agg(fin.head, fin.tail: _*)
}

/** Executor-local TTL cache backing [[Ops.enrichCached]] — the analogue of
  * the reference's `TTLCache` (operators/__init__.py:1275-1358).
  */
private[graft] class TtlCache[K, V](ttlMillis: Long) extends Serializable {
  private val m = new java.util.concurrent.ConcurrentHashMap[K, (Long, V)]()
  def getOrFetch(k: K, fetch: () => V): V = {
    val now = System.currentTimeMillis()
    val cur = m.get(k)
    if (cur != null && now - cur._1 < ttlMillis) cur._2
    else { val v = fetch(); m.put(k, (now, v)); v }
  }
}

private[graft] object TtlCache {
  private val caches = new java.util.concurrent.ConcurrentHashMap[String, TtlCache[_, _]]()
  def instance[K, V](cacheId: String, ttlMillis: Long): TtlCache[K, V] =
    caches
      .computeIfAbsent(cacheId, _ => new TtlCache[K, V](ttlMillis))
      .asInstanceOf[TtlCache[K, V]]
}
