package graft

import java.net.{HttpURLConnection, URI}
import org.apache.spark.sql.functions._
import graft.connectors.Testing
import graft.streaming.{MetricsServer, StreamingOps}

/** The dataflow API webserver: /dataflow serves the flow graph JSON,
  * /metrics serves the span-fed registry in Prometheus text format —
  * the reference's webserver surface (src/webserver/mod.rs) over the
  * JDK HTTP server.
  */
class MetricsServerSpec extends SparkSpec {
  import spark.implicits._

  private def get(url: String): (Int, String, String) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    val status = conn.getResponseCode
    val body = scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
    val ct = conn.getHeaderField("content-type")
    conn.disconnect()
    (status, ct, body)
  }

  test("serves /dataflow JSON and span-fed Prometheus /metrics") {
    val flow = graft.api.Flow("metrics_flow")
    graft.api.ops.input("in", flow, spark, s"$sf0001/region.parquet")
    val guard = MetricsServer.start(spark, flow.toJson, port = 0)
    try {
      val base = s"http://127.0.0.1:${guard.port}"

      val (ds, dct, dbody) = get(s"$base/dataflow")
      assert(ds === 200)
      assert(dct.startsWith("application/json"))
      assert(dbody.contains("\"flow\": \"metrics_flow\"") && dbody.contains("\"id\": \"in\""))

      // drive a traced streaming query so spans feed the registry
      val src = Testing.testingSource[(String, Long)](spark)
      src.addBatch(("a", 1L), ("b", 2L), ("a", 3L))
      StreamingOps.runToMemory(src.toDS().toDF("k", "v"), "metrics_q")

      // listener bus delivery is async: poll until the microbatch
      // counter surfaces (bounded)
      val deadline = System.currentTimeMillis() + 20000
      var body = ""
      while (System.currentTimeMillis() < deadline &&
          !body.contains("""graft_input_rows_total{flow="metrics_q"} 3""")) {
        Thread.sleep(200)
        body = get(s"$base/metrics")._3
      }
      val (ms, mct, _) = get(s"$base/metrics")
      assert(ms === 200)
      assert(mct.startsWith("text/plain"))
      assert(body.contains("# TYPE graft_spans_total counter"), body)
      assert(body.contains("""graft_input_rows_total{flow="metrics_q"} 3"""), body)
      assert(body.contains("""kind="microbatch""""), body)
      assert(body.contains("# TYPE graft_state_rows gauge"), body)
    } finally guard.close()
    // guard.close() stops the server: the port no longer accepts
    intercept[Exception] { get(s"http://127.0.0.1:${guard.port}/metrics") }
  }

  test("custom metrics: a user-set gauge surfaces in /metrics (custom_metrics.py)") {
    // the reference example registers a prometheus Gauge from inside a
    // source partition (examples/custom_metrics.py NEXT_BATCH_DELAY_GAUGE);
    // the analogue is setting a labeled gauge on the server's registry —
    // the observe-based delay computation itself is ported as
    // Examples.periodicCounter
    val guard = MetricsServer.start(spark, "{}", port = 0)
    try {
      guard.registry.set("graft_next_batch_delay_seconds",
        Seq("step_id" -> "periodic", "worker_index" -> "0"), 2L)
      val (_, _, body) = get(s"http://127.0.0.1:${guard.port}/metrics")
      assert(body.contains(
        """graft_next_batch_delay_seconds{step_id="periodic",worker_index="0"} 2"""), body)
      assert(body.contains("# TYPE graft_next_batch_delay_seconds gauge"), body)
    } finally guard.close()
  }

  test("metered flow surfaces per-step row counters (item_inp_count analogue)") {
    // the reference labels its per-step counters by step id
    // (src/operators.rs:599-631); a Flow built with meter = true taps
    // every step with an observe row count that MetricsServer renders
    // as graft_step_rows_total{flow,step}
    val flow = graft.api.Flow("step_metrics", meter = true)
    val guard = MetricsServer.start(spark, flow.toJson, port = 0)
    try {
      val inp = graft.api.ops.input("in", flow, spark, s"$sf0001/region.parquet")
      val filt = graft.api.ops.filter("filt", inp, col("r_regionkey") < 3)
      // a batch action routes observed metrics through the
      // QueryExecutionListener span path
      assert(filt.ds.count() === 3)
      // listener bus delivery is async: poll (bounded)
      val base = s"http://127.0.0.1:${guard.port}"
      val deadline = System.currentTimeMillis() + 20000
      var body = ""
      while (System.currentTimeMillis() < deadline &&
          !body.contains("""step="filt"""")) {
        Thread.sleep(200)
        body = get(s"$base/metrics")._3
      }
      assert(body.contains("# TYPE graft_step_rows_total counter"), body)
      assert(body.matches("(?s).*graft_step_rows_total\\{[^}]*step=\"in\"[^}]*\\} 5\n.*"), body)
      assert(body.matches("(?s).*graft_step_rows_total\\{[^}]*step=\"filt\"[^}]*\\} 3\n.*"), body)
    } finally guard.close()
  }

  test("metered flow tolerates a re-used step id in one query") {
    // Spark rejects duplicate observed-metric names at analysis; a
    // re-used step id on a metered flow gets a ~<n> suffix on later
    // taps (Flow.tap), and the metrics endpoint aggregates the
    // suffixed observations back under one step label. Pre-fix this
    // union threw AnalysisException — a metered-only failure mode.
    val flow = graft.api.Flow("dup_steps", meter = true)
    val guard = MetricsServer.start(spark, flow.toJson, port = 0)
    try {
      val inp = graft.api.ops.input("in", flow, spark, s"$sf0001/region.parquet")
      val lo = graft.api.ops.filter("split", inp, col("r_regionkey") < 2)  // 2 rows
      val hi = graft.api.ops.filter("split", inp, col("r_regionkey") >= 2) // 3 rows
      assert(lo.ds.union(hi.ds).count() === 5)
      val base = s"http://127.0.0.1:${guard.port}"
      val deadline = System.currentTimeMillis() + 20000
      var body = ""
      while (System.currentTimeMillis() < deadline &&
          !body.matches("(?s).*graft_step_rows_total\\{[^}]*step=\"split\"[^}]*\\} 5\n.*")) {
        Thread.sleep(200)
        body = get(s"$base/metrics")._3
      }
      // both taps aggregate under ONE un-suffixed step label: 2 + 3
      assert(body.matches("(?s).*graft_step_rows_total\\{[^}]*step=\"split\"[^}]*\\} 5\n.*"), body)
      assert(!body.contains("step=\"split~"), body)
    } finally guard.close()
  }

  test("GraftFlow exposes its recorded graph for the runner's /dataflow") {
    val wf = new graft.run.WordCountFlow
    assert(wf.graph.isEmpty)
    val out = wf.build(spark, Seq(s"$sf0001/documents.parquet"))
    assert(out.count() > 0)
    assert(wf.graph.exists(_.toJson.contains("\"flow\": \"wordcount\"")))
  }
}
