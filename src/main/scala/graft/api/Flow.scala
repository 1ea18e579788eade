package graft.api

import org.apache.spark.sql.{Dataset, SparkSession}

/** A named dataflow — the analogue of the reference's `Dataflow`
  * (reference: pysrc/bytewax/dataflow.py:177-210). In this engine the
  * operator DAG *is* Catalyst's `LogicalPlan`; `Flow` is a lightweight
  * registry of step ids for diagnostics/visualization (the analogue of
  * `visualize.to_mermaid`, reference pysrc/bytewax/visualize.py:301).
  */
final class Flow(val flowId: String, val meter: Boolean = false) {
  private val steps =
    scala.collection.mutable.LinkedHashMap.empty[String, (String, Seq[String])]

  private[graft] def record(stepId: String, kind: String, ups: Seq[String]): Unit =
    synchronized { steps += (stepId -> ((kind, ups))) }

  private val obsCounts = scala.collection.mutable.HashMap.empty[String, Int]

  /** Per-step row metering (the reference labels its `item_inp_count`
    * /`item_out_count` prometheus counters by step id — reference
    * src/operators.rs:599-631). When the flow is built with
    * `meter = true`, every recorded step taps its output with a
    * `Dataset.observe` row count named `graft_step_<stepId>`; the
    * observation rides the engine's event bus into [[graft.streaming
    * .Tracing]] spans, and [[graft.streaming.MetricsServer]] renders
    * it as `graft_step_rows_total{flow,step}`. Opt-in because the
    * `CollectMetrics` node, while shuffle-free, is visible to
    * plan-shape inspection.
    *
    * Observation names must be unique per query (Spark rejects
    * duplicate observed-metric names at analysis), so a RE-USED step
    * id gets a `~<n>` suffix on its second and later taps; the metrics
    * endpoint strips the suffix, so repeats still aggregate under one
    * `step` label. The one shape naming can't save is the SAME tapped
    * `Dataset` instance appearing twice in one query (e.g. a self-join
    * of a metered stream) — that duplicates the single observe node
    * itself; tap before the fan-out or self-join the un-metered frame.
    */
  private[graft] def tap[T](ds: Dataset[T], stepId: String): Dataset[T] =
    if (meter) {
      val seen = synchronized {
        val c = obsCounts.getOrElse(stepId, 0); obsCounts(stepId) = c + 1; c
      }
      val name = if (seen == 0) "graft_step_" + stepId else s"graft_step_$stepId~$seen"
      ds.observe(name,
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("rows"))
    } else ds

  def stepIds: Seq[String] = synchronized(steps.keys.toSeq)

  /** Render the recorded step graph as JSON (reference:
    * pysrc/bytewax/visualize.py:201 `to_json`).
    */
  def toJson: String = synchronized {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val nodes = steps.map { case (id, (kind, ups)) =>
      s"{${q("id")}: ${q(id)}, ${q("kind")}: ${q(kind)}, ${q("inputs")}: [${ups.map(q).mkString(", ")}]}"
    }
    s"""{${q("flow")}: ${q(flowId)}, ${q("steps")}: [${nodes.mkString(", ")}]}"""
  }

  /** Render the recorded step graph as mermaid (reference:
    * pysrc/bytewax/visualize.py:201-301).
    */
  def toMermaid: String = synchronized {
    val sb = new StringBuilder("flowchart TD\n")
    steps.foreach { case (id, (kind, ups)) =>
      sb.append(s"""  $id["$id ($kind)"]\n""")
      ups.foreach(u => sb.append(s"  $u --> $id\n"))
    }
    sb.result()
  }
}

object Flow {
  def apply(id: String): Flow = new Flow(id)
  def apply(id: String, meter: Boolean): Flow = new Flow(id, meter)
}

/** Typed stream handle — the analogue of the reference's `Stream[X]`
  * (reference: pysrc/bytewax/dataflow.py:213-310). Wraps a lazy
  * `Dataset[T]`; operators extend it via methods in `graft.operators`.
  * `thenDo` mirrors the reference's fluent `.then()` chainer
  * (dataflow.py:252-310).
  */
final case class Stream[T](ds: Dataset[T], flow: Flow, stepId: String) {
  def spark: SparkSession = ds.sparkSession

  def thenDo[U](id: String, f: Dataset[T] => Dataset[U]): Stream[U] = {
    flow.record(id, "then", Seq(stepId))
    Stream(flow.tap(f(ds), id), flow, id)
  }
}

/** Output of `branch` (reference: pysrc/bytewax/operators/__init__.py:107-116). */
final case class BranchOut[T](trues: Stream[T], falses: Stream[T])
