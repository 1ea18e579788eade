package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-query execution-shape probe for the optimization loop (guide
  * §1): runs named gate queries through the noop sink and reports,
  * for each, the number of Spark jobs/stages/tasks it launched and
  * the summed task-level metrics (executor run time, shuffle bytes
  * read/written, spill) from a [[SparkListener]]. Wall seconds tell
  * you WHAT is slow; this tells you WHY — a 3 s query that launches
  * 40 jobs is round-overhead-bound, one that shuffles 2 GB is
  * exchange-bound, and the fix differs.
  *
  * args: sfDir name [name...]; env SPARK_GRAFT_CPUS like Bench.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var runMs = 0L
    @volatile var shufReadB = 0L
    @volatile var shufWriteB = 0L
    @volatile var spillB = 0L
    @volatile var gcMs = 0L
    // per-stage detail for the breakdown mode (-stages): name → summed
    // task metrics, so a query's task time maps back to operators
    val stageDetail = new java.util.concurrent.ConcurrentHashMap[
      Int, (String, Long, Long, Long)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages += 1
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stageDetail.putIfAbsent(s.stageInfo.stageId,
          (s.stageInfo.name.takeWhile(_ != '\n').take(90), 0L, 0L, 0L))
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        val m = t.taskMetrics
        if (m != null) {
          runMs += m.executorRunTime
          gcMs += m.jvmGCTime
          shufReadB += m.shuffleReadMetrics.totalBytesRead
          shufWriteB += m.shuffleWriteMetrics.bytesWritten
          spillB += m.diskBytesSpilled + m.memoryBytesSpilled
          stageDetail.computeIfPresent(t.stageId, (_, v) =>
            (v._1, v._2 + m.executorRunTime,
              v._3 + m.shuffleReadMetrics.totalBytesRead,
              v._4 + m.shuffleWriteMetrics.bytesWritten))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val showStages = sys.env.get("JOBPROBE_STAGES").isDefined

    // warm-up, same as Bench
    graft.SparkEntry.queries.get("q1_agg").foreach { q =>
      q(spark, dir).write.format("noop").mode("overwrite").save()
    }

    println(f"${"query"}%-28s ${"sec"}%7s ${"jobs"}%5s ${"stages"}%6s " +
      f"${"tasks"}%6s ${"runSec"}%7s ${"gcSec"}%6s ${"shRdMB"}%7s " +
      f"${"shWrMB"}%7s ${"spillMB"}%7s")
    for (name <- names) {
      spark.sparkContext.setJobDescription(name)
      jobs = 0; stages = 0; tasks = 0; runMs = 0; shufReadB = 0
      shufWriteB = 0; spillB = 0; gcMs = 0
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // drain the async listener bus: poll until the counters are
      // stable across two consecutive reads (a fixed sleep undercounts
      // when the queue is backlogged after a large run), bounded at 5 s
      var snap = (jobs, stages, tasks, runMs)
      var stable = false
      var waited = 0
      while (!stable && waited < 5000) {
        Thread.sleep(200); waited += 200
        val now = (jobs, stages, tasks, runMs)
        stable = now == snap
        snap = now
      }
      println(f"$name%-28s $dt%7.2f $jobs%5d $stages%6d $tasks%6d " +
        f"${runMs / 1e3}%7.1f ${gcMs / 1e3}%6.1f ${shufReadB / 1e6}%7.1f " +
        f"${shufWriteB / 1e6}%7.1f ${spillB / 1e6}%7.1f")
      if (showStages) {
        import scala.jdk.CollectionConverters._
        stageDetail.asScala.toSeq.sortBy(-_._2._2).take(15).foreach {
          case (sid, (nm, rms, rd, wr)) =>
            println(f"    stage $sid%4d ${rms / 1e3}%8.1f s  " +
              f"rd ${rd / 1e6}%7.1f MB  wr ${wr / 1e6}%7.1f MB  $nm")
        }
        stageDetail.clear()
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
