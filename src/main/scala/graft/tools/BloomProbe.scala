package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Bloom-reduced join vs the plain join, measured on BOTH axes that
  * matter: wall-clock (local, minor) and SHUFFLE WRITE BYTES (the
  * cluster-dominant term the operator exists to cut — at 100 TB the
  * probe side's exchange IS the job). Broadcast joins are disabled to
  * simulate the regime the operator targets: a build side past the
  * broadcast threshold whose bloom filter still broadcasts.
  *
  * Workload: events replicated rep-fold into a unique-key probe side;
  * the build side keeps every 20th key (5% join selectivity — the
  * fact-vs-dimension-subset shape of decontamination / allowlist /
  * delta-join pipelines). The bloom path's build-side count() and
  * sketch aggregation are charged to its numbers — honest accounting.
  *
  * args: [dir] [rep] (default sf0.1, 20×)
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val rep = if (args.length > 1) args(1).toLong else 20L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shuffleBytes = new AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleBytes.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })

    val ev = Tables.load(spark, dir, "events")
    val fact = ev.crossJoin(spark.range(rep).select(col("id").as("r")))
      .select((col("event_id") * rep + col("r")).as("k"), col("value"))
    val nKeys = ev.count() * rep
    val dim = spark.range(0L, nKeys, 20L)
      .select(col("id").as("k"), pmod(col("id"), lit(97L)).cast("double").as("w"))
      .persist()
    dim.count()
    println(s"bloomprobe fact_rows=$nKeys dim_rows=${nKeys / 20} selectivity=0.05")

    def agg(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(count(lit(1)), sum(col("value") * col("w"))).collect()(0).getLong(0)

    for (mode <- Seq("plain", "bloom", "plain", "bloom")) {
      // settle the listener: metrics post asynchronously after collect
      Thread.sleep(500); shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val n = mode match {
        case "plain" => agg(fact.join(dim, Seq("k")))
        case _ => agg(graft.operators.BloomJoin.bloomReduceJoin(fact, dim, Seq("k")))
      }
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"bloomprobe mode=$mode rows=$n sec=$sec%.2f shuffleMB=${shuffleBytes.get / 1e6}%.1f")
    }
    spark.stop()
  }
}
