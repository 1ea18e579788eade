package graft.windowing

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Windowing surface — the analogue of the reference's clock + windower
  * + windowed-aggregation stack (reference: pysrc/bytewax/operators/
  * windowing.py). Spark-first mapping (SURVEY §2.4):
  *
  *  - TumblingWindower (windowing.py:895-926)  → `window(ts, len)`
  *  - SlidingWindower  (windowing.py:842-892)  → `window(ts, len, slide)`
  *  - SessionWindower  (windowing.py:929-950)  → `session_window(ts, gap)`
  *  - EventClock       (windowing.py:224-310)  → event-time column +
  *    `withWatermark` (streaming); on bounded data the watermark is
  *    implicitly +inf at EOF, which matches the reference's
  *    `UTC_MAX` on EOF (windowing.py:301).
  *  - SystemClock      (windowing.py:190-221)  → `current_timestamp()`.
  *
  * Window close / merge bookkeeping (the bulk of windowing.py's 2.3k
  * lines) is delegated to Spark's window/session-window state machinery.
  */
sealed trait Windower {
  /** The grouping expression assigning items to windows. */
  def expr(ts: Column): Column
}

/** Fixed windows; `alignTo` offsets window origins (reference `align_to`,
  * windowing.py:860-870) and maps to `window()`'s startTime parameter.
  */
final case class TumblingWindower(length: String, alignTo: String = "0 seconds") extends Windower {
  def expr(ts: Column): Column = window(ts, length, length, alignTo).as("window")
}

/** Overlapping windows: an item lands in ceil(length/offset) windows
  * (reference intersect math, windowing.py:611-618).
  */
final case class SlidingWindower(length: String, offset: String, alignTo: String = "0 seconds") extends Windower {
  def expr(ts: Column): Column = window(ts, length, offset, alignTo).as("window")
}

/** Gap-based sessions; merging on overlap is handled by Spark's
  * session-window state store (reference `_session_find_merges`,
  * windowing.py:688-715). Boundary semantics (property-tested): an item
  * exactly `gap` after the previous one still EXTENDS the session —
  * Spark merges sessions whose [start, start+gap] windows touch.
  */
final case class SessionWindower(gap: String) extends Windower {
  def expr(ts: Column): Column = session_window(ts, gap).as("window")
}

/** Clock config (reference windowing.py:78-310). `EventClock.waitFor`
  * becomes the streaming watermark delay; ignored on bounded data.
  */
sealed trait Clock
final case class EventClock(tsCol: String, waitFor: String = "0 seconds") extends Clock
case object SystemClock extends Clock

object Windowing {

  /** Timestamp column for a clock: event column or processing time. */
  def tsExpr(clock: Clock): Column = clock match {
    case EventClock(c, _) => col(c)
    case SystemClock      => current_timestamp()
  }

  /** Group a bounded DataFrame by (window, keys); the caller supplies
    * aggregations. The `window` struct column carries WindowMetadata
    * (open/close — reference windowing.py:428-443).
    */
  def groupByWindow(df: DataFrame, clock: Clock, w: Windower, keys: Column*): RelationalGroupedDataset =
    df.groupBy(w.expr(tsExpr(clock)) +: keys: _*)

  /** fold_window / reduce_window (reference windowing.py:1692-1848,
    * 2239-2285): apply arbitrary aggregations per (window, key). Custom
    * folds pass `udaf(Aggregator)` columns — zero ⇔ builder, reduce ⇔
    * folder, merge ⇔ merger (needed for session merges).
    */
  def aggWindow(df: DataFrame, clock: Clock, w: Windower, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    groupByWindow(df, clock, w, keys: _*).agg(aggs.head, aggs.tail: _*)

  /** collect_window (reference windowing.py:1387-1578): values gathered
    * per (window, key), sorted for determinism.
    */
  def collectWindow(df: DataFrame, clock: Clock, w: Windower, keys: Seq[Column], value: Column, as: String = "values"): DataFrame =
    aggWindow(df, clock, w, keys, Seq(array_sort(collect_list(value)).as(as)))

  /** collect_window into set (reference `_collect_get_callbacks` set
    * mode, windowing.py:1356-1384): distinct values, sorted for
    * deterministic output.
    */
  def collectWindowSet(df: DataFrame, clock: Clock, w: Windower, keys: Seq[Column], value: Column, as: String = "values"): DataFrame =
    aggWindow(df, clock, w, keys, Seq(array_sort(collect_set(value)).as(as)))

  /** collect_window into dict (reference dict mode: later write per
    * entry key wins, windowing.py:1356-1384): entries gathered per
    * (window, keys) with max_by(entryValue, order) per entry key —
    * "last" is defined by `order` (an event id / timestamp) since
    * bounded data has no arrival order. Output is a sorted
    * "k:v,k:v" string (MapType has no deterministic comparison).
    * Two-level aggregation: both shuffles carry map-side partials.
    */
  def collectWindowMap(df: DataFrame, clock: Clock, w: Windower, keyCols: Seq[String],
      entryKey: Column, entryValue: Column, order: Column, as: String = "entries"): DataFrame = {
    val perEntry = df
      .groupBy(w.expr(tsExpr(clock)) +: (keyCols.map(col) :+ entryKey.as("__k")): _*)
      .agg(max_by(entryValue, order).as("__v"))
    perEntry
      .groupBy(col("window") +: keyCols.map(col): _*)
      .agg(concat_ws(",",
        array_sort(collect_list(concat(col("__k"), lit(":"), col("__v"))))).as(as))
  }

  /** count_window (reference windowing.py:1579-1689). */
  def countWindow(df: DataFrame, clock: Clock, w: Windower, keys: Seq[Column], as: String = "n"): DataFrame =
    aggWindow(df, clock, w, keys, Seq(count(lit(1)).as(as)))

  /** max_window / min_window with optional `by` (reference windowing.py:2141-2236). */
  def maxWindow(df: DataFrame, clock: Clock, w: Windower, keys: Seq[Column], value: Column, by: Option[Column] = None, as: String = "mx"): DataFrame =
    aggWindow(df, clock, w, keys, Seq(by.map(b => max_by(value, b)).getOrElse(max(value)).as(as)))

  def minWindow(df: DataFrame, clock: Clock, w: Windower, keys: Seq[Column], value: Column, by: Option[Column] = None, as: String = "mn"): DataFrame =
    aggWindow(df, clock, w, keys, Seq(by.map(b => min_by(value, b)).getOrElse(min(value)).as(as)))

  /** join_window (reference windowing.py:1849-2140): N sides aggregated
    * per (window, key) then equi-joined on (window, key). `sideAgg` picks
    * the per-side retention (first/last ⇔ min_by/max_by, product ⇔
    * collect_list + later explode).
    */
  def joinWindow(clock: Clock, w: Windower, keyCol: String, sides: Seq[(DataFrame, Column, String)]): DataFrame = {
    val agged = sides.map { case (df, valueAgg, as) =>
      groupByWindow(df, clock, w, col(keyCol)).agg(valueAgg.as(as))
    }
    agged.reduce((a, b) => a.join(b, Seq("window", keyCol), "inner"))
  }

  /** WindowOut.meta (reference windowing.py:1193-1222): window metadata
    * stream — open/close times per emitted window.
    */
  def windowMeta(df: DataFrame): DataFrame =
    df.select(col("window.start").as("open_time"), col("window.end").as("close_time"))

  /** WindowOut.late (reference windowing.py:1193-1222): on bounded data
    * every item is on time (EOF watermark = +inf, matching the
    * reference's EventClock-at-EOF); streaming late-data tee lives in
    * graft.streaming.
    */
  def lateBatch(df: DataFrame): DataFrame = df.limit(0)
}
