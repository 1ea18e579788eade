package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

/** Execution tracing — the analogue of the reference's
  * `bytewax.tracing.setup_tracing` (pysrc/bytewax/tracing.py: wires
  * OTel/Jaeger exporters around dataflow execution) and `_metrics.py`
  * (scrapes the process-wide prometheus registry).
  *
  * Spark-first rendering: execution progress already flows through two
  * engine event buses — `StreamingQueryListener` for micro-batch
  * progress (rows, durations, state, watermark, per-step observed
  * metrics) and `QueryExecutionListener` for batch actions. `setup`
  * subscribes both and renders each event as a [[Span]] handed to the
  * caller's exporter function (stdout, a file, an OTLP client — the
  * reference's `TracingConfig` choice is exactly this function).
  * Returns a guard that detaches both listeners, like the reference's
  * `setup_tracing` return value that must be kept alive.
  *
  * The per-step gauges the reference exposes via prometheus
  * (`custom_metrics.py`'s `Gauge`) surface here as `Dataset.observe`
  * metrics: every observed metric on the query lands in
  * `Span.observed`, keyed by observation name.
  */
object Tracing {

  /** One traced execution unit: a micro-batch of a streaming query or
    * one batch action. `observed` carries `Dataset.observe` metric rows
    * (observation name -> rendered row).
    */
  final case class Span(
      flow: String,
      kind: String, // "microbatch" | "batch" | "query-start" | "query-stop"
      id: String,
      batchId: Long,
      durationMs: Long,
      inputRows: Long,
      stateRows: Long,
      observed: Map[String, String])

  /** Listener guard: keep it referenced while tracing; `close()`
    * unsubscribes (the reference: "the return value must be kept
    * alive").
    */
  final class TracingGuard(spark: SparkSession,
      sl: StreamingQueryListener, ql: QueryExecutionListener)
      extends AutoCloseable {
    def close(): Unit = {
      spark.streams.removeListener(sl)
      spark.listenerManager.unregister(ql)
    }
  }

  def setup(spark: SparkSession)(export: Span => Unit): TracingGuard = {
    val sl = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        export(Span(Option(e.name).getOrElse(""), "query-start",
          e.id.toString, -1L, 0L, 0L, 0L, Map.empty))
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val state = Option(p.stateOperators).toSeq.flatten
          .map(_.numRowsTotal).sum
        val observed = {
          val m = p.observedMetrics
          if (m == null) Map.empty[String, String]
          else {
            val out = Map.newBuilder[String, String]
            m.forEach((k, row) => out += (k -> row.toString))
            out.result()
          }
        }
        export(Span(Option(p.name).getOrElse(""), "microbatch",
          p.id.toString, p.batchId,
          Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L),
          p.numInputRows, state, observed))
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        export(Span("", "query-stop", e.id.toString, -1L, 0L, 0L, 0L, Map.empty))
    }
    val ql = new QueryExecutionListener {
      private def observed(qe: QueryExecution): Map[String, String] =
        qe.observedMetrics.map { case (k, row) => k -> row.toString }
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        export(Span(qe.sparkSession.sparkContext.appName, "batch", funcName,
          -1L, durationNs / 1000000L,
          0L, 0L, observed(qe)))
      override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit =
        export(Span(qe.sparkSession.sparkContext.appName, "batch-failed", funcName,
          -1L, 0L, 0L, 0L, Map.empty))
    }
    spark.streams.addListener(sl)
    spark.listenerManager.register(ql)
    new TracingGuard(spark, sl, ql)
  }

  /** Collecting exporter for tests/diagnostics: spans accumulate in a
    * thread-safe queue (listener callbacks fire on engine threads).
    */
  final class Collector {
    private val q = new ConcurrentLinkedQueue[Span]()
    def export(s: Span): Unit = { q.add(s); () }
    def spans: Seq[Span] = {
      val it = q.iterator()
      val b = Seq.newBuilder[Span]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }
}
