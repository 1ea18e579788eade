package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

/** Capture the EXECUTED plans of a gate query — including every
  * internal action the eager round-lifecycle operators run (each
  * `Rounds.mark` count, persist materialization, …), which the
  * gate-level `explain()` cannot show (it sees only the final
  * checkpoint scan). A [[QueryExecutionListener]] records each
  * action's executed plan in order; output goes to stdout between
  * BEGIN/END markers per query for the plans/ deliverables.
  *
  * args: sfDir name [name...]
  */
object PlanCapture {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.functions.TopK.FallbackConf,
        graft.functions.TopK.RequiredFallbackThreshold.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plans = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        plans.add(s"--- action: $funcName (${durationNs / 1000000} ms)\n" +
          qe.executedPlan.toString.take(24000))
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    for (name <- names) {
      plans.clear()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      // let the async listener drain
      Thread.sleep(1500)
      println(s"===== BEGIN $name =====")
      println(s"== gate-level formatted plan (the eager operators show " +
        s"only their final checkpoint here; internal actions follow) ==")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      import scala.jdk.CollectionConverters._
      plans.asScala.zipWithIndex.foreach { case (p, i) =>
        println(s"== internal action ${i + 1} ==")
        println(p)
      }
      println(s"===== END $name =====")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
