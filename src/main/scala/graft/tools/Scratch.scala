package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.connectors.Testing
import graft.streaming.StreamingDedup

/** Dev scratchpad — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_STREAM_SHUFFLE", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        sys.env.getOrElse("SPARK_GRAFT_STREAM_CHANGELOG", "true"))
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = graft.Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()

    val mode = sys.env.getOrElse("SCRATCH_MODE", "full")
    val src = Testing.testingSource[(Long, String)](spark, numPartitions = Some(32))
    val out = mode match {
      case "noprep" =>
        // skip shingling/minhash: key directly on doc_id % 80000, carry a tiny array
        import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues}
        val base = src.toDS().toDF("doc_id", "text")
          .select(col("doc_id").as("id"))
          .as[Long]
          .flatMap(id => (0 until 16).map(b => (id * 16 + b, id, Array(1L, 2L, 3L))))
        base.groupByKey(_._1).transformWithState(
          new StatefulProcessor[Long, (Long, Long, Array[Long]), (Long, Long, Double)] {
            override def init(o: OutputMode, t: TimeMode): Unit = ()
            override def handleInputRows(k: Long, rows: Iterator[(Long, Long, Array[Long])],
                tv: TimerValues): Iterator[(Long, Long, Double)] = { rows.size; Iterator.empty }
          }, TimeMode.None(), OutputMode.Append())
      case _ =>
        StreamingDedup.nearDupPairs(src.toDS().toDF("doc_id", "text"),
          "doc_id", "text", n = 3, numHashes = 64, bands = 16, threshold = 0.5,
          maxBucketSize = 128)
    }
    val q = out.toDF("i", "j", "jac").writeStream
      .format("memory").queryName("scratch_bench").outputMode("append")
      .option("checkpointLocation", s"/tmp/graft-scratch-${System.nanoTime()}")
      .start()
    val t0 = System.nanoTime()
    docs.grouped(500).foreach { g =>
      src.addBatch(g.toSeq: _*)
      q.processAllAvailable()
    }
    println(f"wall=${(System.nanoTime() - t0) / 1e9}%.2f s  mode=$mode")
    // durationMs breakdown across all micro-batches
    val agg = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    var batches = 0
    q.recentProgress.foreach { p =>
      batches += 1
      p.durationMs.forEach((k, v) => agg(k) += v)
    }
    println(s"batches=$batches")
    agg.toSeq.sortBy(-_._2).foreach { case (k, v) =>
      println(f"$k%-28s total=${v}%6d ms  per-batch=${v.toDouble / batches}%8.1f ms")
    }
    val so = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    q.recentProgress.foreach { p =>
      p.stateOperators.foreach { s =>
        so("allUpdatesTimeMs") += s.allUpdatesTimeMs
        so("allRemovalsTimeMs") += s.allRemovalsTimeMs
        so("commitTimeMs") += s.commitTimeMs
        so("numRowsUpdated") += s.numRowsUpdated
        so("numStateRows") = s.numRowsTotal
      }
    }
    so.toSeq.sortBy(_._1).foreach { case (k, v) => println(f"state.$k%-26s $v") }
    q.stop()
    spark.stop()
  }
}
