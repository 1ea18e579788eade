package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** Spark 4 `transformWithState` bridge — the closest structural match to
  * the reference's `StatefulBatchLogic` lifecycle (reference
  * pysrc/bytewax/operators/__init__.py:593-792):
  *
  *  - `on_batch`   ⇔ `handleInputRows`
  *  - `notify_at`  ⇔ `StatefulProcessorHandle.registerTimer`
  *  - `on_notify`  ⇔ `handleExpiredTimer`
  *  - `snapshot`   ⇔ state-store persistence (free via checkpoint)
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass`), which is also the
  * recommended provider at 100 TB state sizes.
  */
object TransformWithStateOps {

  /** The reference's `StatefulBatchLogic` as a Scala trait. Return state
    * `None` from callbacks to discard (⇔ `StatefulLogic.DISCARD`).
    */
  trait GraftStatefulLogic[K, V, S, W] extends Serializable {
    def onBatch(key: K, values: Seq[V], state: Option[S]): (Option[S], Seq[W])
    /** Called when a timer registered via the returned `notifyAtMs` of
      * [[onBatch]] fires. Default: no-op.
      */
    def onNotify(key: K, state: Option[S]): (Option[S], Seq[W]) = (state, Seq.empty)
    /** Processing-time delay for wake-up timers; None disables timers.
      * DEBOUNCE semantics: each batch for a key replaces that key's
      * pending timer, so [[onNotify]] fires only after the key has
      * been IDLE for the delay — the `wait_for_system_duration`
      * posture of the reference's EventClock (windowing.py:263-287):
      * a quiet stream eventually flushes, an active one never flushes
      * mid-disorder-window.
      */
    def notifyAfterMs: Option[Long] = None

    /** Optional state TTL: entries idle longer than this are expired by
      * the state store (no reference analogue — bytewax state lives
      * until explicitly discarded — but free with transformWithState
      * and essential for unbounded key spaces at 100 TB).
      */
    def stateTtl: Option[java.time.Duration] = None
  }

  private class LogicProcessor[K, V, S, W](
      logic: GraftStatefulLogic[K, V, S, W], sEnc: Encoder[S])
    extends StatefulProcessor[K, (K, V), (K, W)] {

    @transient private var state: ValueState[S] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[S]("graft_state", sEnc,
        logic.stateTtl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: K, rows: Iterator[(K, V)], tv: TimerValues): Iterator[(K, W)] = {
      val cur = if (state.exists()) Some(state.get()) else None
      val (next, out) = logic.onBatch(key, rows.map(_._2).toSeq, cur)
      next match {
        case Some(s) =>
          state.update(s)
          logic.notifyAfterMs.foreach { d =>
            // debounce: replace any pending timer so the notify fires
            // only after the key goes idle for d ms
            getHandle.listTimers().toSeq.foreach(getHandle.deleteTimer)
            getHandle.registerTimer(tv.getCurrentProcessingTimeInMs() + d)
          }
        case None => state.clear()
      }
      out.map((key, _)).iterator
    }

    override def handleExpiredTimer(key: K, tv: TimerValues, info: ExpiredTimerInfo): Iterator[(K, W)] = {
      val cur = if (state.exists()) Some(state.get()) else None
      val (next, out) = logic.onNotify(key, cur)
      next match {
        case Some(s) => state.update(s)
        case None    => state.clear()
      }
      out.map((key, _)).iterator
    }
  }

  /** stateful_batch on the transformWithState engine. TimeMode defaults
    * to the logic's needs: ProcessingTime only when timers are in play —
    * a timer-capable operator keeps scheduling micro-batches, so
    * timerless logic must run in TimeMode.None for queries to drain.
    *
    * Engine-choice throughput (measured, `tools/TwsBench`, 1M items /
    * 10k keys / RocksDB both sides): TWS pays ~60 µs/key-visit of
    * engine machinery over `StreamingOps.statefulStream` on the
    * simplest ValueState shape (~1.8× wall on a pure running sum) and
    * reaches parity on ListState shapes (bounded collect 1.0–1.1×).
    * Default remains TWS for the capability surface (timers, TTL,
    * typed ListState/MapState); the FMGWS engine stays the documented
    * compat path for simple high-rate shapes.
    */
  def statefulTws[K: Encoder, V, S, W](
      ds: Dataset[(K, V)], logic: GraftStatefulLogic[K, V, S, W],
      timeMode: TimeMode = null)(
      implicit sEnc: Encoder[S], outEnc: Encoder[(K, W)]): Dataset[(K, W)] = {
    val tm = Option(timeMode).getOrElse(
      if (logic.notifyAfterMs.isDefined) TimeMode.ProcessingTime() else TimeMode.None())
    ds.groupByKey(_._1)
      .transformWithState(new LogicProcessor[K, V, S, W](logic, sEnc), tm, OutputMode.Append())
  }

  /** collect via transformWithState ListState — buffers per key, flushes
    * at maxSize (timer-based timeout flush via [[GraftStatefulLogic]]
    * wiring when running with a processing-time trigger).
    */
  private class CollectProcessor[K, V](maxSize: Int, timeoutMs: Long, vEnc: Encoder[V])
    extends StatefulProcessor[K, (K, V), (K, Seq[V])] {

    @transient private var buf: ListState[V] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[V]("graft_collect", vEnc, TTLConfig.NONE)

    override def handleInputRows(key: K, rows: Iterator[(K, V)], tv: TimerValues): Iterator[(K, Seq[V])] = {
      var cur = if (buf.exists()) buf.get().toVector else Vector.empty[V]
      val out = Vector.newBuilder[(K, Seq[V])]
      rows.foreach { case (_, v) =>
        cur = cur :+ v
        if (cur.size >= maxSize) { out += ((key, cur)); cur = Vector.empty }
      }
      buf.clear()
      if (cur.nonEmpty) {
        buf.put(cur.toArray[Any].asInstanceOf[Array[V]])
        getHandle.registerTimer(tv.getCurrentProcessingTimeInMs() + timeoutMs)
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: K, tv: TimerValues, info: ExpiredTimerInfo): Iterator[(K, Seq[V])] = {
      val cur = if (buf.exists()) buf.get().toVector else Vector.empty[V]
      buf.clear()
      if (cur.nonEmpty) Iterator.single((key, cur)) else Iterator.empty
    }
  }

  def collectTws[K: Encoder, V](
      ds: Dataset[(K, V)], maxSize: Int, timeoutMs: Long)(
      implicit vEnc: Encoder[V], outEnc: Encoder[(K, Seq[V])]): Dataset[(K, Seq[V])] =
    ds.groupByKey(_._1)
      .transformWithState(new CollectProcessor[K, V](maxSize, timeoutMs, vEnc),
        TimeMode.ProcessingTime(), OutputMode.Append())
}
