package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming._

/** Event-time streaming as-of join (temporal join): enrich a keyed
  * event stream with the latest right-side "version" whose time is <=
  * the event's time — the streaming form of [[graft.operators.AsofJoin]]
  * (backward direction), and the classic stream-to-versioned-table
  * join (price as of trade time) every feature pipeline needs.
  *
  * Correctness under out-of-order arrival is the whole problem: a
  * version with rt <= lt may arrive AFTER the event it should enrich.
  * Emitting on arrival would silently join against a stale version, so
  * left events are buffered in state and released only when the
  * event-time watermark passes their timestamp — at that point every
  * version that can precede them (modulo the declared lateness bound)
  * has been observed. This is Flink's event-time temporal-join rule,
  * expressed on `transformWithState`:
  *
  *  - both inputs carry `withWatermark` upstream (the watermark VALUE
  *    is query-global — min across sources — so it survives the typed
  *    union; TWS never needs the marked column itself);
  *  - left events append to a ListState buffer + register an
  *    event-time timer at their own timestamp;
  *  - right versions append to a ListState version log;
  *  - on timer fire, all buffered events with lt <= watermark match
  *    against the newest version with rt <= lt and emit (Append mode —
  *    no retractions, matching the watermark contract);
  *  - versions at or below the watermark are pruned to the single
  *    newest one (still reachable by future events, which all have
  *    lt > watermark — anything older is dead state).
  *
  * State per key is O(events inside the watermark horizon + versions
  * since the last prune) — bounded by the lateness delay × arrival
  * rate, the same envelope as a windowed aggregation, so the operator
  * holds at 100 TB/day ingest exactly where `window()` does. Events
  * that arrive already below the watermark (late beyond the bound) are
  * matched and emitted immediately, best-effort, against the versions
  * currently in state.
  */
object StreamingAsof {

  /** (key, eventTimeMs, leftPayload, matchedRightTimeMs, matchedRightPayload) */
  type Out[K, L, R] = (K, Long, L, Option[Long], Option[R])

  private class AsofProcessor[K, L, R](
      lsEnc: Encoder[(Long, L)], rsEnc: Encoder[(Long, R)])
    extends StatefulProcessor[K, (K, Long, Int, Option[L], Option[R]), Out[K, L, R]] {

    @transient private var bufL: ListState[(Long, L)] = _
    @transient private var vers: ListState[(Long, R)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      bufL = getHandle.getListState[(Long, L)]("graft_asof_left", lsEnc, TTLConfig.NONE)
      vers = getHandle.getListState[(Long, R)]("graft_asof_versions", rsEnc, TTLConfig.NONE)
    }

    private def matchOne(key: K, lt: Long, payload: L): Out[K, L, R] = {
      var bestT = Long.MinValue
      var best: Option[R] = None
      val it = vers.get()
      while (it.hasNext) {
        val (rt, rv) = it.next()
        if (rt <= lt && rt > bestT) { bestT = rt; best = Some(rv) }
      }
      (key, lt, payload, if (best.isDefined) Some(bestT) else None, best)
    }

    override def handleInputRows(key: K, rows: Iterator[(K, Long, Int, Option[L], Option[R])],
        tv: TimerValues): Iterator[Out[K, L, R]] = {
      val wm = tv.getCurrentWatermarkInMs()
      val out = Vector.newBuilder[Out[K, L, R]]
      rows.foreach {
        case (_, rt, 0, _, Some(rv)) =>
          vers.appendValue((rt, rv))
        case (_, lt, 1, Some(lv), _) =>
          if (lt <= wm) out += matchOne(key, lt, lv) // beyond-lateness arrival: best effort, now
          else {
            bufL.appendValue((lt, lv))
            getHandle.registerTimer(lt)
          }
        case _ => ()
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: K, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Out[K, L, R]] = {
      val wm = tv.getCurrentWatermarkInMs()
      val pending = bufL.get().toVector
      if (pending.isEmpty) return Iterator.empty
      val (ripe, rest) = pending.partition(_._1 <= wm)
      val out = ripe.sortBy(_._1).map { case (lt, lv) => matchOne(key, lt, lv) }
      bufL.clear()
      if (rest.nonEmpty) bufL.put(rest.toArray)
      // prune the version log: future events all have lt > wm, so only
      // the newest version at-or-below wm stays reachable
      if (ripe.nonEmpty) {
        val all = vers.get().toVector
        val (old, live) = all.partition(_._1 <= wm)
        if (old.size > 1) {
          val keep = old.maxBy(_._1) +: live
          vers.clear()
          vers.put(keep.toArray)
        }
      }
      out.iterator
    }
  }

  /** @param left  (key, eventTimeMs, payload) — source watermarked upstream
    * @param right (key, versionTimeMs, payload) — source watermarked upstream
    */
  def asofBackward[K, L, R](
      left: Dataset[(K, Long, L)],
      right: Dataset[(K, Long, R)])(
      implicit kEnc: Encoder[K],
      inEnc: Encoder[(K, Long, Int, Option[L], Option[R])],
      lsEnc: Encoder[(Long, L)],
      rsEnc: Encoder[(Long, R)],
      outEnc: Encoder[Out[K, L, R]]): Dataset[Out[K, L, R]] = {
    val l2 = left.map(x => (x._1, x._2, 1, Option(x._3), Option.empty[R]))
    val r2 = right.map(x => (x._1, x._2, 0, Option.empty[L], Option(x._3)))
    l2.union(r2)
      .groupByKey(_._1)
      .transformWithState(new AsofProcessor[K, L, R](lsEnc, rsEnc),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
