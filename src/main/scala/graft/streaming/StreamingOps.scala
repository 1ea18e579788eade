package graft.streaming

import org.apache.spark.sql._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import graft.windowing.{Clock, EventClock, SystemClock, Windower, Windowing}

/** Streaming analogues of the stateful/windowed operator surface —
  * the `stateful_batch` core on unbounded data (reference:
  * src/operators.rs:441-1041). Mapping:
  *
  *  - per-key state + epoch-ordered application → `mapGroupsWithState` /
  *    `flatMapGroupsWithState` over `groupByKey` (hash exchange ⇔ the
  *    reference's routed exchange, src/operators.rs:572-594)
  *  - `notify_at`/`on_notify` timers (src/operators.rs:813-860) →
  *    `GroupState.setTimeoutTimestamp` / timeout-fired invocations
  *  - `snapshot()` per epoch (src/recovery.rs) → state-store
  *    checkpointing (free; delete-on-restart semantics handled by
  *    `checkpointLocation`)
  *  - EOF (`on_eof`) → no true EOF on streams; run with
  *    `Trigger.AvailableNow` for bounded catch-up, matching the
  *    reference's "only works on finite streams" note for *_final ops.
  */
object StreamingOps {

  /** stateful_map on a stream: per-key running (S, V) → (S, W).
    * Emits one output per input row. Uses update-mode
    * flatMapGroupsWithState with no timeout (pure data-driven state).
    */
  def statefulMapStream[K: Encoder, V, S: Encoder, W: Encoder](
      ds: Dataset[(K, V)], init: K => S)(step: (S, V) => (S, W))(
      implicit kvEnc: Encoder[(K, V)], outEnc: Encoder[(K, W)]): Dataset[(K, W)] =
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[S, (K, W)](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(K, V)], state: GroupState[S]) =>
          var s = state.getOption.getOrElse(init(key))
          val out = rows.map { case (_, v) =>
            val (s2, w) = step(s, v)
            s = s2
            (key, w)
          }.toVector
          state.update(s)
          out.iterator
      }

  /** collect on a stream (reference operators/__init__.py:1106-1218):
    * buffer values per key, flush as a batch when `maxSize` is reached
    * or `timeoutMillis` passes without new input (processing-time
    * timeout ⇔ the reference's `notify_at` timer).
    */
  def collectStream[K: Encoder, V: Encoder](
      ds: Dataset[(K, V)], maxSize: Int, timeoutMillis: Long)(
      implicit kvEnc: Encoder[(K, V)], outEnc: Encoder[(K, Seq[V])],
      bufEnc: Encoder[Vector[V]]): Dataset[(K, Seq[V])] =
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[Vector[V], (K, Seq[V])](OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (key: K, rows: Iterator[(K, V)], state: GroupState[Vector[V]]) =>
          if (state.hasTimedOut) {
            val buf = state.getOption.getOrElse(Vector.empty)
            state.remove()
            if (buf.nonEmpty) Iterator.single((key, buf)) else Iterator.empty
          } else {
            var buf = state.getOption.getOrElse(Vector.empty)
            val flushed = Vector.newBuilder[(K, Seq[V])]
            rows.foreach { case (_, v) =>
              buf = buf :+ v
              if (buf.size >= maxSize) { flushed += ((key, buf)); buf = Vector.empty }
            }
            if (buf.nonEmpty) {
              state.update(buf)
              state.setTimeoutDuration(timeoutMillis)
            } else state.remove()
            flushed.result().iterator
          }
      }

  /** Generic keyed state machine on a stream — the closest analogue of
    * `StatefulBatchLogic.on_batch` + `on_notify` (reference
    * operators/__init__.py:593-792). `onBatch` sees the key's batch and
    * state; `onTimeout` fires after `timeoutMillis` idle. Return
    * (newState | None to clear, emitted rows).
    */
  def statefulStream[K: Encoder, V, S: Encoder, W: Encoder](
      ds: Dataset[(K, V)], timeoutMillis: Option[Long])(
      onBatch: (K, Seq[V], Option[S]) => (Option[S], Seq[W]),
      onTimeout: (K, S) => (Option[S], Seq[W]) = (_: K, _: S) => (None, Seq.empty[W]))(
      implicit kvEnc: Encoder[(K, V)], outEnc: Encoder[(K, W)]): Dataset[(K, W)] = {
    val timeoutConf = if (timeoutMillis.isDefined) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[S, (K, W)](OutputMode.Append, timeoutConf) {
        (key: K, rows: Iterator[(K, V)], state: GroupState[S]) =>
          if (state.hasTimedOut) {
            val (s2, out) = onTimeout(key, state.get)
            s2 match { case Some(s) => state.update(s); case None => state.remove() }
            out.map((key, _)).iterator
          } else {
            val (s2, out) = onBatch(key, rows.map(_._2).toSeq, state.getOption)
            s2 match {
              case Some(s) =>
                state.update(s)
                timeoutMillis.foreach(state.setTimeoutDuration)
              case None => state.remove()
            }
            out.map((key, _)).iterator
          }
      }
  }

  /** Windowed aggregation on a stream: EventClock.waitFor becomes the
    * watermark delay (reference windowing.py:224-310 — minus the
    * idle-wall-clock advance, which Spark's data-driven watermark does
    * not do; documented divergence, SURVEY §4.3).
    */
  def windowStream(df: DataFrame, clock: Clock, w: Windower, keys: Seq[Column], aggs: Seq[Column]): DataFrame = {
    val prepared = clock match {
      case EventClock(tsCol, waitFor) => df.withWatermark(tsCol, waitFor)
      case SystemClock                => df.withColumn("__proc_ts", current_timestamp())
    }
    val ts = clock match {
      case EventClock(c, _) => col(c)
      case SystemClock      => col("__proc_ts")
    }
    prepared.groupBy(w.expr(ts) +: keys: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** WindowOut.late approximation (reference windowing.py:1193-1222):
    * tee of rows older than `delay` behind the key's max event time so
    * far — per-key watermarks, matching the reference's per-key clock
    * (windowing.py:78-187) and keeping the window computation
    * partitioned by key (a global max would serialize on one task).
    * Spark's true watermark lives in StreamingQueryProgress; this
    * per-microbatch approximation marks rows the windowed agg will drop.
    */
  def lateTee(df: DataFrame, tsCol: String, delay: String, keyCols: Column*): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keyCols: _*)
    df.withColumn("__max_ts", max(col(tsCol)).over(w))
      .filter(col(tsCol) < col("__max_ts") - expr(s"INTERVAL $delay"))
      .drop("__max_ts")
  }

  /** Run a streaming Dataset to a named in-memory table and block until
    * all available input is processed (the `run_main` testing analogue,
    * reference testing.py:259+).
    */
  def runToMemory[T](ds: Dataset[T], name: String, outputMode: OutputMode = OutputMode.Append): DataFrame = {
    val q = ds.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
    ds.sparkSession.table(name)
  }

  /** Like [[runToMemory]] but safe for ProcessingTimeTimeout state ops:
    * those keep scheduling micro-batches, so `processAllAvailable` never
    * settles (Spark's documented behavior for timer-driven state). Polls
    * the sink until `expectedRows` appear or `timeoutMs` elapses, then
    * stops the query.
    */
  def runToMemoryUntil[T](ds: Dataset[T], name: String, expectedRows: Long,
      timeoutMs: Long, outputMode: OutputMode = OutputMode.Append): DataFrame = {
    val spark = ds.sparkSession
    val q = ds.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline &&
        spark.table(name).count() < expectedRows) {
      Thread.sleep(200)
    }
    q.stop()
    spark.table(name)
  }
}
