package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import graft.streaming.TransformWithStateOps.GraftStatefulLogic

/** Streaming face of the event-sequence analytics family: the funnel
  * as a transformWithState operator whose per-entity state is the
  * SAME fixed k-vector of step times as the batch operator — bounded
  * under key skew, never an event buffer.
  *
  * Ordering contract: the batch funnel's earliest-completion
  * semantics over full history is not incrementally computable from
  * bounded state under arbitrary arrival order (a late-arriving
  * EARLIER step-1 event would retroactively rewrite every later
  * step). The streaming operator therefore processes events in
  * event-time order WITHIN each micro-batch and assumes in-order
  * arrival ACROSS micro-batches per entity (the StreamingAsof
  * posture: order by watermark upstream if the source reorders);
  * under that contract the final per-entity vector is EXACTLY the
  * batch funnel's row, for any micro-batch split — spec-pinned. An
  * out-of-order stray that would have changed an already-taken step
  * is ignored, never a wrong partial.
  *
  * For streams that DO reorder (the Kafka-shaped norm), every family
  * member also ships a `...Disordered` face wrapping the same logic
  * in a [[StreamingEvents.DisorderLogic bounded-disorder reorder
  * buffer]] — the reference EventClock's `wait_for_event_duration`
  * tolerance: events within `disorderUs` of the entity's high-water
  * mark arrive in any order and the output still equals the batch
  * operator's exactly (spec-pinned under randomized bounded
  * disorder); only events later than the tolerance drop.
  */
object StreamingEvents {

  /** Bounded-disorder reorder buffer around ANY family logic — the
    * reference EventClock's `wait_for_event_duration` semantics
    * (pysrc/bytewax/operators/windowing.py:263-287) for this family:
    * instead of assuming in-order arrival across micro-batches, each
    * entity buffers incoming events and releases them to the inner
    * logic IN EVENT-TIME ORDER once the entity's high-water mark has
    * advanced `disorderUs` past them (frontier = max seen − disorder;
    * an event still > frontier waits in the buffer). An event
    * arriving at or below the already-released frontier is LATE
    * beyond the tolerance and is dropped — never fed out of order,
    * never retro-processed (the reference drops past-watermark items
    * the same way). With `idleFlushMs` > 0, a processing-time
    * debounce timer ([[TransformWithStateOps.GraftStatefulLogic
    * .notifyAfterMs]]) drains the remaining buffer in order after the
    * entity goes idle — the EventClock's system-time watermark
    * advancement — after which the frontier sits at the max seen
    * time.
    *
    * EXACTNESS: for any arrival order satisfying the bound (no event
    * arrives after the entity's max-seen time exceeded its own time
    * + disorderUs), the released sequence is the fully-sorted event
    * sequence, so the inner logic's output is EXACTLY its in-order
    * output — batch parity for every family member under randomized
    * bounded disorder is spec-pinned. State = the inner state plus
    * the disorder window's own working set (events within disorderUs
    * of the high-water mark — the semantics' minimal buffer) and two
    * longs.
    */
  private final class DisorderLogic[K, V, S, W](
      inner: GraftStatefulLogic[K, V, S, W], timeOf: V => Long,
      disorderUs: Long, idleFlushMs: Long,
      ttl: Option[java.time.Duration])
    extends GraftStatefulLogic[K, V, (Seq[V], Long, Long, Option[S]), W] {
    override def stateTtl: Option[java.time.Duration] = ttl
    override def notifyAfterMs: Option[Long] =
      if (idleFlushMs > 0) Some(idleFlushMs) else None
    override def onBatch(key: K, values: Seq[V],
        state: Option[(Seq[V], Long, Long, Option[S])])
        : (Option[(Seq[V], Long, Long, Option[S])], Seq[W]) = {
      val (buf0, seen0, flushed0, is0) = state.getOrElse(
        (Seq.empty[V], Long.MinValue, Long.MinValue, Option.empty[S]))
      val fresh = values.filter(v =>
        flushed0 == Long.MinValue || timeOf(v) > flushed0)
      val buf = buf0 ++ fresh
      val seen = (seen0 +: values.map(timeOf)).max
      // saturating: a high-water mark near MinValue must not wrap
      val frontier =
        if (seen < Long.MinValue + disorderUs) Long.MinValue
        else seen - disorderUs
      val (ripe, rest) = buf.partition(v => timeOf(v) <= frontier)
      if (ripe.isEmpty) (Some((rest, seen, flushed0, is0)), Seq.empty)
      else {
        // ripe events all precede every still-buffered or future
        // event; the inner logic sorts within the call, so the
        // released order is globally event-time sorted
        val (is1, out) = inner.onBatch(key, ripe, is0)
        (Some((rest, seen, math.max(frontier, flushed0), is1)), out)
      }
    }
    override def onNotify(key: K,
        state: Option[(Seq[V], Long, Long, Option[S])])
        : (Option[(Seq[V], Long, Long, Option[S])], Seq[W]) = state match {
      case Some((buf, seen, flushed, is0)) if buf.nonEmpty =>
        val (is1, out) = inner.onBatch(key, buf, is0)
        (Some((Seq.empty[V], seen, math.max(seen, flushed), is1)), out)
      case other => (other, Seq.empty)
    }
  }

  /** Per-entity funnel progress: the times of the reached step
    * prefix. Emits the updated prefix whenever it advances (the last
    * emission per entity is the funnel row so far).
    */
  private class FunnelLogic(steps: Seq[String], maxSpanUs: Option[Long],
      ttl: Option[java.time.Duration])
    extends GraftStatefulLogic[Long, (Long, String), Seq[Long], Seq[Long]] {
    override def stateTtl: Option[java.time.Duration] = ttl
    override def onBatch(key: Long, values: Seq[(Long, String)],
        state: Option[Seq[Long]]): (Option[Seq[Long]], Seq[Seq[Long]]) = {
      var v = state.getOrElse(Seq.empty[Long]).toVector
      val before = v.length
      values.sortBy(_._1).foreach { case (us, et) =>
        val i = v.length
        if (i < steps.length && et == steps(i) &&
            (i == 0 || us > v(i - 1)) &&
            (i == 0 || maxSpanUs.forall(sp => us <= v.head + sp)))
          v = v :+ us
      }
      if (v.isEmpty) (None, Seq.empty)
      else (Some(v), if (v.length > before) Seq(v) else Seq.empty)
    }
  }

  /** `events` = (entity, (eventTimeUs, eventType)). Output: (entity,
    * reached-step times) emitted on every advance; the per-entity
    * LAST output equals the batch [[graft.functions.Events.funnel]]
    * row (nulls = the missing suffix) under the in-order contract.
    * `ttl` bounds state for unbounded entity spaces.
    */
  def funnelStream(events: Dataset[(Long, (Long, String))],
      steps: Seq[String], maxSpanUs: Option[Long] = None,
      ttl: Option[java.time.Duration] = None)(
      implicit sEnc: Encoder[Seq[Long]],
      outEnc: Encoder[(Long, Seq[Long])]): Dataset[(Long, Seq[Long])] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    import events.sparkSession.implicits._
    TransformWithStateOps.statefulTws[Long, (Long, String), Seq[Long], Seq[Long]](
      events, new FunnelLogic(steps, maxSpanUs, ttl))
  }

  /** Per-entity attribution state: the touch buffer inside the
    * lookback horizon (pruned as event time advances — bounded by the
    * entity's true touch rate × lookback, the semantics' own working
    * set) plus the last attributed conversion time (same-instant
    * duplicate conversions attribute once, the batch contract).
    */
  private class AttributionLogic(convType: String, touchTypes: Set[String],
      lookbackUs: Long, model: String, unit: Long,
      ttl: Option[java.time.Duration])
    extends GraftStatefulLogic[Long, (Long, Long, String, String),
      (Seq[(Long, Long, String)], Long),
      (Long, Long, Long, String, Long, Long)] {
    override def stateTtl: Option[java.time.Duration] = ttl
    private def credit(n: Int, isF: Boolean, isL: Boolean): Long =
      model match {
        case "first" => if (isF) unit else 0L
        case "last" => if (isL) unit else 0L
        case "linear" => unit / n
        case _ => // position: non-negative operands, / floors
          if (n == 1) unit
          else if (n == 2) { if (isF) unit / 2 else unit - unit / 2 }
          else if (isF || isL) unit * 4 / 10
          else unit * 2 / 10 / (n - 2)
      }
    override def onBatch(key: Long, values: Seq[(Long, Long, String, String)],
        state: Option[(Seq[(Long, Long, String)], Long)])
        : (Option[(Seq[(Long, Long, String)], Long)],
           Seq[(Long, Long, Long, String, Long, Long)]) = {
      var (touches, lastConv) = state.getOrElse(
        (Seq.empty[(Long, Long, String)], Long.MinValue))
      var buf = touches.toVector
      val out = Vector.newBuilder[(Long, Long, Long, String, Long, Long)]
      values.sortBy(v => (v._1, v._2)).foreach { case (us, id, et, ch) =>
        if (et == convType && us != lastConv) {
          val w = buf.filter(t => t._1 >= us - lookbackUs && t._1 < us)
          if (w.nonEmpty) {
            val fst = w.minBy(t => (t._1, t._2))
            val lst = w.maxBy(t => (t._1, t._2))
            val n = w.length
            w.foreach { t =>
              out += ((us, t._2, t._1, t._3, n.toLong,
                credit(n, t == fst, t == lst)))
            }
          }
          lastConv = us
        }
        if (touchTypes(et)) {
          // prune: in-order contract means no future conversion can
          // look back past us - lookback
          buf = buf.filter(_._1 >= us - lookbackUs) :+ ((us, id, ch))
        }
      }
      (Some((buf, lastConv)), out.result())
    }
  }

  /** Streaming multi-touch attribution: `events` = (entity,
    * (eventTimeUs, eventId, eventType, channel)); on every conversion
    * event, emit one row per in-window touch — (entity, (conv_us,
    * touch_id, touch_us, channel, n_touch, credit)) — with credit
    * split under the same first/last/linear/position models, exact
    * unit arithmetic, and (time, id) tie-breaks as the batch
    * [[graft.functions.Events.attribution]]; under the family's
    * in-order contract the emitted rows are EXACTLY the batch detail
    * relation for any micro-batch split (spec-pinned). An
    * out-of-order stray touch is never retro-attributed to an
    * already-emitted conversion (emissions are final — the streaming
    * posture), and same-instant duplicate conversions attribute once.
    * State = the lookback touch window per entity (its true working
    * set) + one long; `ttl` bounds it for unbounded entity spaces.
    *
    * INPUT CONTRACT (shared with the batch operator): touch ids must
    * uniquely identify touch events within an entity. This face
    * identifies first/last by full-tuple identity, the batch face by
    * the tie-broken touch id — the two coincide exactly when ids are
    * unique, and diverge only on data that violates the contract
    * (duplicate ids at different times).
    */
  def attributionStream(events: Dataset[(Long, (Long, Long, String, String))],
      convType: String, touchTypes: Seq[String], lookbackUs: Long,
      model: String = "linear", unit: Long = 1000000L,
      ttl: Option[java.time.Duration] = None)(
      implicit sEnc: Encoder[(Seq[(Long, Long, String)], Long)],
      outEnc: Encoder[(Long, (Long, Long, Long, String, Long, Long))])
      : Dataset[(Long, (Long, Long, Long, String, Long, Long))] = {
    require(lookbackUs > 0, "lookbackUs must be positive")
    require(unit > 0, "unit must be positive")
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(Set("first", "last", "linear", "position")(model),
      s"unknown attribution model $model")
    import events.sparkSession.implicits._
    TransformWithStateOps.statefulTws[Long, (Long, Long, String, String),
      (Seq[(Long, Long, String)], Long),
      (Long, Long, Long, String, Long, Long)](
      events, new AttributionLogic(convType, touchTypes.toSet, lookbackUs,
        model, unit, ttl))
  }

  /** Per-entity CUSUM state: (prefix sum, running clamped minimum) —
    * two longs; the batch closed form's window pair made explicit. */
  private class CusumLogic(ref: Long, threshold: Long,
      ttl: Option[java.time.Duration])
    extends GraftStatefulLogic[Long, (Long, Long), (Long, Long),
      (Long, Long, Long, Boolean)] {
    override def stateTtl: Option[java.time.Duration] = ttl
    override def onBatch(key: Long, values: Seq[(Long, Long)],
        state: Option[(Long, Long)])
        : (Option[(Long, Long)], Seq[(Long, Long, Long, Boolean)]) = {
      var (p, minp) = state.getOrElse((0L, 0L))
      val out = values.sorted.map { case (us, v) =>
        p += v - ref
        if (p < minp) minp = p
        val c = p - minp
        (us, v, c, c > threshold)
      }
      (Some((p, minp)), out)
    }
  }

  /** Streaming one-sided CUSUM change-point detection — the online
    * face of [[graft.functions.Events.cusum]]: per entity,
    * s = max(0, s + (x − ref)) with `is_shift` when s exceeds
    * `threshold`, carried as the (prefix sum, clamped running min)
    * pair the batch closed form uses — exact long arithmetic, so
    * under the family's in-order contract every row equals the batch
    * operator's (spec-pinned across micro-batch splits; same-instant
    * ordering within a batch falls back to value order — pass
    * `tieBreak = Seq(valueCol)` batch-side for exact parity there).
    * `events` = (entity, (eventTimeUs, value)); output (entity,
    * (us, value, cusum, is_shift)). State = two longs per entity;
    * `ttl` bounds it (an expired entity restarts its baseline).
    */
  def cusumStream(events: Dataset[(Long, (Long, Long))], ref: Long,
      threshold: Long, ttl: Option[java.time.Duration] = None)(
      implicit sEnc: Encoder[(Long, Long)],
      outEnc: Encoder[(Long, (Long, Long, Long, Boolean))])
      : Dataset[(Long, (Long, Long, Long, Boolean))] = {
    require(threshold > 0, "threshold must be positive")
    import events.sparkSession.implicits._
    TransformWithStateOps.statefulTws[Long, (Long, Long), (Long, Long),
      (Long, Long, Long, Boolean)](events, new CusumLogic(ref, threshold, ttl))
  }

  /** Per-entity transition state: the (time, type) of the last event
    * — two fields, the lag(1) window's state made explicit. */
  private class TransitionLogic(ttl: Option[java.time.Duration])
    extends GraftStatefulLogic[Long, (Long, String), (Long, String),
      (String, String)] {
    override def stateTtl: Option[java.time.Duration] = ttl
    override def onBatch(key: Long, values: Seq[(Long, String)],
        state: Option[(Long, String)])
        : (Option[(Long, String)], Seq[(String, String)]) = {
      var prev = state
      val out = values.sorted.map { case (us, et) =>
        val pair = prev.map(p => (p._2, et))
        prev = Some((us, et))
        pair
      }.collect { case Some(p) => p }
      (prev, out)
    }
  }

  /** Streaming event-type transitions — the raw (from, to) PAIR
    * stream behind the batch Markov matrix
    * ([[graft.functions.Events.transitions]]): `events` = (entity,
    * (eventTimeUs, eventType)); every event after an entity's first
    * emits one (entity, (from_type, to_type)) row. Aggregate
    * downstream for the matrix (per micro-batch, or cumulatively).
    * Same in-order contract as the rest of the family; within a
    * micro-batch events process in (time, type) order — same-instant
    * ordering falls back to TYPE order, so for exact batch parity
    * pass `tieBreak = Seq(typeCol)` on the batch side (the batch
    * default leaves same-instant lag order engine-chosen).
    * Spec-pinned pair-multiset parity under any micro-batch split.
    * State = one (time, type) per entity; `ttl` bounds it.
    */
  def transitionsStream(events: Dataset[(Long, (Long, String))],
      ttl: Option[java.time.Duration] = None)(
      implicit sEnc: Encoder[(Long, String)],
      outEnc: Encoder[(Long, (String, String))])
      : Dataset[(Long, (String, String))] = {
    import events.sparkSession.implicits._
    TransformWithStateOps.statefulTws[Long, (Long, String),
      (Long, String), (String, String)](events, new TransitionLogic(ttl))
  }

  /** Per-entity gap-sessionization state: (last event time, current
    * session index) — two longs, the same bounded shape as the batch
    * operator's window state. Each event emits its (time, session)
    * assignment.
    */
  private class SessionLogic(gapUs: Long, ttl: Option[java.time.Duration])
    extends GraftStatefulLogic[Long, Long, (Long, Long), (Long, Long)] {
    override def stateTtl: Option[java.time.Duration] = ttl
    override def onBatch(key: Long, values: Seq[Long],
        state: Option[(Long, Long)]): (Option[(Long, Long)], Seq[(Long, Long)]) = {
      var (last, idx) = state.getOrElse((0L, 0L))
      val out = values.sorted.map { us =>
        // idx == 0 means "no previous event" — seed last from the event
        // itself rather than gap-checking against the (0,0) sentinel, so
        // entities whose first event time is negative still match the
        // batch operator's lag-based assignment exactly
        if (idx == 0L) { idx = 1L; last = us }
        else if (us - last > gapUs) idx += 1
        last = math.max(last, us)
        (us, idx)
      }
      (Some((last, idx)), out)
    }
  }

  /** Streaming gap sessionization: `events` = (entity, eventTimeUs);
    * output (entity, (us, session_idx)) — one row per input event,
    * session indices 1-based per entity, boundary strictly greater
    * than `gapUs` (a gap of exactly gapUs continues the session, the
    * batch [[graft.functions.Events.sessionize]] contract). Same
    * in-order-across-batches posture as [[funnelStream]]; within a
    * micro-batch events are processed in event-time order. Under that
    * contract the assignment is EXACTLY the batch operator's for any
    * micro-batch split — spec-pinned. State is two longs per entity;
    * `ttl` bounds it for unbounded entity spaces (an entity whose
    * state expires restarts at session 1).
    */
  def sessionizeStream(events: Dataset[(Long, Long)], gapUs: Long,
      ttl: Option[java.time.Duration] = None)(
      implicit sEnc: Encoder[(Long, Long)],
      outEnc: Encoder[(Long, (Long, Long))]): Dataset[(Long, (Long, Long))] = {
    require(gapUs > 0, "gapUs must be positive")
    import events.sparkSession.implicits._
    TransformWithStateOps.statefulTws[Long, Long, (Long, Long), (Long, Long)](
      events, new SessionLogic(gapUs, ttl))
  }

  // ——— bounded-disorder faces ———————————————————————————————————
  // Each wraps its family logic in [[DisorderLogic]]: events within
  // `disorderUs` of the entity's high-water mark may arrive in any
  // order and are released to the logic event-time-sorted, so output
  // equals the IN-ORDER face's (and therefore the batch operator's)
  // under any bounded-disorder arrival — spec-pinned per family.
  // `idleFlushMs` > 0 drains each entity's buffer after that much
  // processing-time idleness (the reference EventClock's system-time
  // watermark advancement); 0 leaves the tail buffered until more
  // events advance the frontier. disorderUs = 0 degrades to the
  // in-order contract with the buffer releasing every event as soon
  // as the high-water mark touches it.

  /** [[funnelStream]] under bounded disorder. */
  def funnelStreamDisordered(events: Dataset[(Long, (Long, String))],
      steps: Seq[String], disorderUs: Long, maxSpanUs: Option[Long] = None,
      idleFlushMs: Long = 0L, ttl: Option[java.time.Duration] = None)
      : Dataset[(Long, Seq[Long])] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(disorderUs >= 0, "disorderUs must be >= 0")
    import events.sparkSession.implicits._
    implicit val wEnc
        : Encoder[(Seq[(Long, String)], Long, Long, Option[Seq[Long]])] =
      org.apache.spark.sql.Encoders.product
    TransformWithStateOps.statefulTws(events,
      new DisorderLogic(new FunnelLogic(steps, maxSpanUs, None),
        (v: (Long, String)) => v._1, disorderUs, idleFlushMs, ttl))
  }

  /** [[attributionStream]] under bounded disorder. */
  def attributionStreamDisordered(
      events: Dataset[(Long, (Long, Long, String, String))],
      convType: String, touchTypes: Seq[String], lookbackUs: Long,
      disorderUs: Long, model: String = "linear", unit: Long = 1000000L,
      idleFlushMs: Long = 0L, ttl: Option[java.time.Duration] = None)
      : Dataset[(Long, (Long, Long, Long, String, Long, Long))] = {
    require(lookbackUs > 0, "lookbackUs must be positive")
    require(unit > 0, "unit must be positive")
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(disorderUs >= 0, "disorderUs must be >= 0")
    require(Set("first", "last", "linear", "position")(model),
      s"unknown attribution model $model")
    import events.sparkSession.implicits._
    implicit val wEnc: Encoder[(Seq[(Long, Long, String, String)], Long,
        Long, Option[(Seq[(Long, Long, String)], Long)])] =
      org.apache.spark.sql.Encoders.product
    TransformWithStateOps.statefulTws(events,
      new DisorderLogic(new AttributionLogic(convType, touchTypes.toSet,
          lookbackUs, model, unit, None),
        (v: (Long, Long, String, String)) => v._1, disorderUs,
        idleFlushMs, ttl))
  }

  /** [[cusumStream]] under bounded disorder. */
  def cusumStreamDisordered(events: Dataset[(Long, (Long, Long))],
      ref: Long, threshold: Long, disorderUs: Long,
      idleFlushMs: Long = 0L, ttl: Option[java.time.Duration] = None)
      : Dataset[(Long, (Long, Long, Long, Boolean))] = {
    require(threshold > 0, "threshold must be positive")
    require(disorderUs >= 0, "disorderUs must be >= 0")
    import events.sparkSession.implicits._
    implicit val wEnc
        : Encoder[(Seq[(Long, Long)], Long, Long, Option[(Long, Long)])] =
      org.apache.spark.sql.Encoders.product
    TransformWithStateOps.statefulTws(events,
      new DisorderLogic(new CusumLogic(ref, threshold, None),
        (v: (Long, Long)) => v._1, disorderUs, idleFlushMs, ttl))
  }

  /** [[transitionsStream]] under bounded disorder. */
  def transitionsStreamDisordered(events: Dataset[(Long, (Long, String))],
      disorderUs: Long, idleFlushMs: Long = 0L,
      ttl: Option[java.time.Duration] = None)
      : Dataset[(Long, (String, String))] = {
    require(disorderUs >= 0, "disorderUs must be >= 0")
    import events.sparkSession.implicits._
    implicit val wEnc
        : Encoder[(Seq[(Long, String)], Long, Long, Option[(Long, String)])] =
      org.apache.spark.sql.Encoders.product
    TransformWithStateOps.statefulTws(events,
      new DisorderLogic(new TransitionLogic(None),
        (v: (Long, String)) => v._1, disorderUs, idleFlushMs, ttl))
  }

  /** [[sessionizeStream]] under bounded disorder. */
  def sessionizeStreamDisordered(events: Dataset[(Long, Long)], gapUs: Long,
      disorderUs: Long, idleFlushMs: Long = 0L,
      ttl: Option[java.time.Duration] = None): Dataset[(Long, (Long, Long))] = {
    require(gapUs > 0, "gapUs must be positive")
    require(disorderUs >= 0, "disorderUs must be >= 0")
    import events.sparkSession.implicits._
    implicit val wEnc: Encoder[(Seq[Long], Long, Long, Option[(Long, Long)])] =
      org.apache.spark.sql.Encoders.product
    TransformWithStateOps.statefulTws(events,
      new DisorderLogic(new SessionLogic(gapUs, None),
        (v: Long) => v, disorderUs, idleFlushMs, ttl))
  }
}
