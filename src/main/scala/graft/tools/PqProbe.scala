package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Pq, PqModel, Similarity}

/** Where does the PQ candidate join actually spend its time?
  * Isolates (a) encode placement — per corpus row before the
  * exchange vs per joined candidate after it, (b) ADC scoring vs
  * exact cosine on IDENTICAL candidate sets, (c) the IVF ranked
  * relation recompute. Run at data/sf1.
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/data/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .appName("pq-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("PQPROBE pid " + ProcessHandle.current().pid())
    val emb = Tables.load(spark, dir, "embeddings")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    println(s"PQPROBE corpus $n vectors")

    def t(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val df = f
      df.write.format("noop").mode("overwrite").save()
      println(f"PQPROBE $name%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    val bits = Similarity.autoBits(n, 64)
    val model = PqModel.train(emb, col("vec_id"), col("embedding"), m = 8, ksub = 256)
    val bucket = Similarity.lshBucket(col("embedding"), bits)

    // stage-level attribution for the cold run
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val ms = for {
            s <- si.submissionTime; c <- si.completionTime
          } yield c - s
          if (ms.exists(_ > 1000)) {
            val m = si.taskMetrics
            println(f"PQPROBE   stage ${si.stageId}%4d ${ms.get / 1000.0}%7.2f s  tasks=${si.numTasks} run=${m.executorRunTime / 1000.0}%.1f cpu=${m.executorCpuTime / 1e9}%.1f gc=${m.jvmGCTime / 1000.0}%.1f deser=${m.executorDeserializeTime / 1000.0}%.1f resSer=${m.resultSerializationTime / 1000.0}%.1f  ${si.name.take(60)}")
          }
        }
      })

    // exact-cosine in-bucket baseline (identical candidate sets)
    t("exact bucketTopK (cosine)") {
      Similarity.bucketTopK(emb, "vec_id", "embedding", 3, bucket)
    }
    t("warm exact bucketTopK") {
      Similarity.bucketTopK(emb, "vec_id", "embedding", 3, bucket)
    }
    t("pq topk (direct ADC)") {
      Similarity.pqTopK(emb, "vec_id", "embedding", 3, model, bucket)
    }
    t("warm pq topk") {
      Similarity.pqTopK(emb, "vec_id", "embedding", 3, model, bucket)
    }
    // encode cost alone, once per corpus row
    t("encode only (50k rows)") {
      emb.select(col("vec_id"), Pq.pq_encode(col("embedding"), model).as("c"))
    }
    // a DIFFERENT query shape (k=4 changes the rank literal → fresh
    // codegen): if cold cost is Janino compilation it recurs here
    t("pq topk k=4 (fresh codegen)") {
      Similarity.pqTopK(emb, "vec_id", "embedding", 4, model, bucket)
    }
    // same fresh-shape probe with whole-stage codegen OFF: interpreted
    // eval pays per-row cost but no compilation
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    t("pq topk k=5 (no wholestage)") {
      Similarity.pqTopK(emb, "vec_id", "embedding", 5, model, bucket)
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // a fresh MODEL instance (same shape, new reference object): does
    // the codegen cache miss on the reference?
    val model2 = PqModel.train(emb, col("vec_id"), col("embedding"), m = 8, ksub = 256, seed = 1L)
    t("pq topk fresh model (k=3)") {
      Similarity.pqTopK(emb, "vec_id", "embedding", 3, model2, bucket)
    }
    // IVF tier decomposition (JIT warm by now)
    t("ivf auto exact (it=2)") {
      Similarity.ivfTopKAuto(emb, "vec_id", "embedding", 3)
    }
    t("ivfpq auto (it=2)") {
      Similarity.ivfPqTopKAuto(emb, "vec_id", "embedding", 3)
    }
    val nlist = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
    t("ivfpq pretrained (it=2)") {
      Similarity.ivfPqTopK(emb, "vec_id", "embedding", 3, model, nlist, 2)
    }
    t("ivfpq pretrained (it=0)") {
      Similarity.ivfPqTopK(emb, "vec_id", "embedding", 3, model, nlist, 2, iterations = 0)
    }
    t("ivf exact (it=0)") {
      Similarity.ivfTopK(emb, "vec_id", "embedding", 3, nlist, 2, iterations = 0)
    }
    // is PqEncode above or below the exchange in the join plan?
    val plan = Similarity.pqTopK(emb, "vec_id", "embedding", 3, model, bucket)
      .queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toSeq
    val encodeLines = lines.zipWithIndex.filter(_._1.contains("pqencode"))
    val exchangeLines = lines.zipWithIndex.filter(_._1.contains("Exchange"))
    println("PQPROBE encode at plan lines: " + encodeLines.map(_._2).mkString(","))
    println("PQPROBE exchanges at plan lines: " + exchangeLines.map(_._2).mkString(","))
    encodeLines.foreach { case (l, i) => println(s"PQPROBE [$i] ${l.trim.take(160)}") }
    spark.stop()
  }
}
