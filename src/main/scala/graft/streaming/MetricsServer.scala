package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder
import org.apache.spark.sql.SparkSession

/** The reference's dataflow API webserver re-expressed Spark-side
  * (reference src/webserver/mod.rs:19-72: `GET /dataflow` → the
  * dataflow graph as JSON, `GET /metrics` → the process's prometheus
  * registry in text exposition format; port from
  * `BYTEWAX_DATAFLOW_API_PORT`, default 3030).
  *
  * Rendering: the JDK's built-in `com.sun.net.httpserver` (no extra
  * dependency, daemon executor) serves
  *
  *   - `/dataflow`: the caller-supplied JSON thunk — pass
  *     `flow.toJson` from [[graft.api.Flow]], the same step/edge shape
  *     the reference serializes;
  *   - `/metrics`: Prometheus text exposition (`# TYPE` headers +
  *     `name{labels} value` samples) aggregated from the [[Tracing]]
  *     span stream, which [[start]] subscribes for you:
  *       `graft_spans_total{flow,kind}` — span count by kind,
  *       `graft_input_rows_total{flow}` — micro-batch input rows,
  *       `graft_duration_ms_total{flow,kind}` — summed span wall,
  *       `graft_state_rows{flow}` — last observed state-store rows,
  *       `graft_step_rows_total{flow,step}` — per-step row counts
  *         from metered flows (`Flow(id, meter = true)`), the
  *         analogue of the reference's step-labeled
  *         `item_inp_count`/`item_out_count` counters
  *         (src/operators.rs:599-631).
  *
  * Spark's own UI/metrics system remains the cluster-scale surface;
  * this endpoint exists for parity with reference deployments that
  * scrape the dataflow process directly.
  */
object MetricsServer {

  private final class Key(val metric: String, val labels: String) {
    override def hashCode: Int = metric.hashCode * 31 + labels.hashCode
    override def equals(o: Any): Boolean = o match {
      case k: Key => k.metric == metric && k.labels == labels
      case _      => false
    }
  }

  /** Thread-safe Prometheus-style registry: counters accumulate,
    * gauges hold the last value. Label values are escaped per the
    * exposition format (backslash, quote, newline).
    */
  final class Registry {
    private val counters = new ConcurrentHashMap[Key, LongAdder]()
    private val gauges = new ConcurrentHashMap[Key, java.lang.Long]()
    private def esc(v: String): String =
      v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")
    private def key(metric: String, labels: Seq[(String, String)]): Key =
      new Key(metric,
        labels.map { case (k, v) => s"""$k="${esc(v)}"""" }.mkString(","))

    def inc(metric: String, labels: Seq[(String, String)], delta: Long): Unit =
      counters.computeIfAbsent(key(metric, labels), _ => new LongAdder).add(delta)
    def set(metric: String, labels: Seq[(String, String)], value: Long): Unit =
      gauges.put(key(metric, labels), value)

    /** Text exposition format, samples sorted for deterministic output. */
    def render(): String = {
      val sb = new StringBuilder
      def emit(tpe: String, entries: Seq[(Key, Long)]): Unit =
        entries.groupBy(_._1.metric).toSeq.sortBy(_._1).foreach { case (m, es) =>
          sb.append(s"# TYPE $m $tpe\n")
          es.sortBy(_._1.labels).foreach { case (k, v) =>
            val lbl = if (k.labels.isEmpty) "" else s"{${k.labels}}"
            sb.append(s"$m$lbl $v\n")
          }
        }
      val cs = {
        val it = counters.entrySet().iterator()
        val b = Seq.newBuilder[(Key, Long)]
        while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue.sum()) }
        b.result()
      }
      val gs = {
        val it = gauges.entrySet().iterator()
        val b = Seq.newBuilder[(Key, Long)]
        while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue.longValue) }
        b.result()
      }
      emit("counter", cs)
      emit("gauge", gs)
      sb.toString
    }
  }

  /** Server + listener guard; `close()` stops the HTTP server and
    * detaches the tracing listeners (the reference: the webserver task
    * dies with the dataflow).
    */
  final class Guard(server: HttpServer, tracing: Tracing.TracingGuard,
      val registry: Registry) extends AutoCloseable {
    /** Actual bound port (use port 0 in `start` for an ephemeral one). */
    def port: Int = server.getAddress.getPort
    def close(): Unit = { server.stop(0); tracing.close() }
  }

  /** Start the API server and subscribe the span-fed metrics registry.
    * `port` 0 binds an ephemeral port (tests); the reference's default
    * is 3030 via its port env var — pass `sys.env.get("GRAFT_DATAFLOW_API_PORT")`
    * semantics at the call site if env-driven configuration is wanted.
    */
  /** A metered step's observation renders its single count column as
    * `[n]` (Row.toString) — anything else means the observation is
    * not a step tap and is skipped.
    */
  private val StepRows = """\[(\d+)\]""".r

  def start(spark: SparkSession, dataflowJson: => String, port: Int = 3030): Guard = {
    val registry = new Registry
    val tracing = Tracing.setup(spark) { span =>
      val flow = Seq("flow" -> span.flow)
      registry.inc("graft_spans_total", flow :+ ("kind" -> span.kind), 1L)
      registry.inc("graft_duration_ms_total", flow :+ ("kind" -> span.kind), span.durationMs)
      if (span.kind == "microbatch") {
        registry.inc("graft_input_rows_total", flow, span.inputRows)
        registry.set("graft_state_rows", flow, span.stateRows)
      }
      // step taps from metered flows (batch and streaming spans alike)
      span.observed.foreach {
        case (name, StepRows(n)) if name.startsWith("graft_step_") =>
          // `~<n>` disambiguates re-used step ids per query (observe
          // names must be unique); the label aggregates them back
          registry.inc("graft_step_rows_total",
            flow :+ ("step" -> name.stripPrefix("graft_step_").replaceAll("~\\d+$", "")),
            n.toLong)
        case _ => ()
      }
    }
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    def respond(ex: HttpExchange, status: Int, contentType: String, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("content-type", contentType)
      ex.sendResponseHeaders(status, bytes.length.toLong)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
    server.createContext("/dataflow", new HttpHandler {
      def handle(ex: HttpExchange): Unit =
        respond(ex, 200, "application/json", dataflowJson)
    })
    server.createContext("/metrics", new HttpHandler {
      def handle(ex: HttpExchange): Unit =
        respond(ex, 200, "text/plain; version=0.0.4", registry.render())
    })
    server.setExecutor(null) // default executor: serve on the dispatch thread
    server.start()
    new Guard(server, tracing, registry)
  }
}
