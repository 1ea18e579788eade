package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.connectors.Testing
import graft.streaming.StreamingJoin

/** Stream-stream interval join: cross-micro-batch matching, band
  * semantics, batch/stream parity, and the outer join's
  * watermark-gated null emission.
  */
class StreamingJoinSpec extends SparkSpec {
  import spark.implicits._

  private def leftDf(ds: org.apache.spark.sql.Dataset[(Long, Long, Double)]): DataFrame =
    ds.select($"_1".as("key"), timestamp_millis($"_2").as("lts"), $"_3".as("lv"))

  private def rightDf(ds: org.apache.spark.sql.Dataset[(Long, Long, Double)]): DataFrame =
    ds.select($"_1".as("key"), timestamp_millis($"_2").as("rts"), $"_3".as("rv"))

  test("inner interval join matches across micro-batches and respects the band") {
    val lSrc = Testing.testingSource[(Long, Long, Double)](spark)
    val rSrc = Testing.testingSource[(Long, Long, Double)](spark)
    val out = StreamingJoin.intervalJoin(
      leftDf(lSrc.toDS()), "lts", rightDf(rSrc.toDS()), "rts",
      key = "key", lower = "10 milliseconds", upper = "20 milliseconds",
      delay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sij1")
      .outputMode("append").start()
    try {
      // left at t=100, band [90, 120]
      lSrc.addBatch((1L, 100L, 1.0))
      q.processAllAvailable()
      // rights arrive in a LATER micro-batch: 95 (in), 120 (edge-in),
      // 121 (out), 89 (out), other key (out)
      rSrc.addBatch((1L, 95L, 10.0), (1L, 120L, 11.0), (1L, 121L, 12.0),
        (1L, 89L, 13.0), (2L, 100L, 14.0))
      q.processAllAvailable()
      val got = spark.table("sij1").select($"lv", $"rv").as[(Double, Double)]
        .collect().toSet
      assert(got === Set((1.0, 10.0), (1.0, 11.0)))
    } finally q.stop()
  }

  test("stream result equals the batch analogue on an out-of-order feed") {
    val lRows = Seq((1L, 100L, 1.0), (1L, 250L, 2.0), (2L, 100L, 3.0), (3L, 500L, 4.0))
    val rRows = Seq((1L, 110L, 10.0), (1L, 240L, 11.0), (2L, 130L, 12.0),
      (1L, 90L, 13.0), (2L, 95L, 14.0))
    val batch = StreamingJoin.intervalJoinBatch(
        leftDf(lRows.toDS()), "lts", rightDf(rRows.toDS()), "rts",
        "key", "15 milliseconds", "30 milliseconds")
      .select($"lv", $"rv").as[(Double, Double)].collect().sorted.toSeq

    val lSrc = Testing.testingSource[(Long, Long, Double)](spark)
    val rSrc = Testing.testingSource[(Long, Long, Double)](spark)
    val out = StreamingJoin.intervalJoin(
      leftDf(lSrc.toDS()), "lts", rightDf(rSrc.toDS()), "rts",
      "key", "15 milliseconds", "30 milliseconds", delay = "1 second")
    val q = out.writeStream.format("memory").queryName("sij2")
      .outputMode("append").start()
    try {
      // deliberately interleaved out of event-time order
      lSrc.addBatch(lRows(1), lRows(3))
      rSrc.addBatch(rRows(2), rRows(0))
      q.processAllAvailable()
      lSrc.addBatch(lRows(0), lRows(2))
      rSrc.addBatch(rRows(4), rRows(1), rRows(3))
      q.processAllAvailable()
      val got = spark.table("sij2").select($"lv", $"rv").as[(Double, Double)]
        .collect().sorted.toSeq
      assert(got === batch)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("buffered join state survives a stop/restart: match emits across the checkpoint") {
    import java.nio.file.Files
    val ckpt = Files.createTempDirectory("graft-sij-ckpt").toFile.getPath
    val outDir = Files.createTempDirectory("graft-sij-out").toFile.getPath
    val lSrc = Testing.testingSource[(Long, Long, Double)](spark)
    val rSrc = Testing.testingSource[(Long, Long, Double)](spark)
    def startQuery() =
      StreamingJoin.intervalJoin(
          leftDf(lSrc.toDS()), "lts", rightDf(rSrc.toDS()), "rts",
          "key", "10 milliseconds", "100 milliseconds", delay = "1 second")
        .select($"key", $"lv", $"rv").writeStream
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()

    // run 1: only the left side of the pair arrives — it must be
    // buffered in join state (its band reaches to lt+100)
    val q1 = startQuery()
    lSrc.addBatch((1L, 1000L, 1.0))
    rSrc.addBatch((2L, 900L, -2.0))
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(outDir).filter($"key" === 1L).count() === 0L,
      "no match may exist before the right row arrives")

    // run 2: the matching right row arrives AFTER restart — the pair
    // can only emit if the buffered left row was recovered
    val q2 = startQuery()
    rSrc.addBatch((1L, 1050L, 10.0))
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(outDir).filter($"key" === 1L)
      .select($"lv", $"rv").as[(Double, Double)].collect().toSet
    assert(got === Set((1.0, 10.0)))
  }

  test("left-outer emits null-padded non-matches only after the watermark closes the band") {
    val lSrc = Testing.testingSource[(Long, Long, Double)](spark)
    val rSrc = Testing.testingSource[(Long, Long, Double)](spark)
    val out = StreamingJoin.intervalJoin(
      leftDf(lSrc.toDS()), "lts", rightDf(rSrc.toDS()), "rts",
      "key", "10 milliseconds", "10 milliseconds", delay = "0 seconds",
      joinType = "left_outer")
    val q = out.writeStream.format("memory").queryName("sij3")
      .outputMode("append").start()
    try {
      lSrc.addBatch((1L, 100L, 1.0), (2L, 100L, 2.0))
      rSrc.addBatch((1L, 105L, 10.0))
      q.processAllAvailable()
      // key 2 has no match, but its band can still fill — no null row yet
      val early = spark.table("sij3").filter($"rv".isNull).count()
      assert(early === 0L)
      // push both watermarks far past the band
      lSrc.addBatch((8L, 10000L, -1.0))
      rSrc.addBatch((9L, 10000L, -1.0))
      q.processAllAvailable()
      lSrc.addBatch((8L, 20000L, -1.0))
      rSrc.addBatch((9L, 20000L, -1.0))
      q.processAllAvailable()
      val rows = spark.table("sij3").select($"lv", $"rv").collect()
      val matched = rows.filter(r => !r.isNullAt(1)).map(r => (r.getDouble(0), r.getDouble(1)))
      assert(matched.toSet === Set((1.0, 10.0)))
      val nulls = rows.filter(_.isNullAt(1)).map(_.getDouble(0)).toSet
      assert(nulls.contains(2.0), s"unmatched left should null-emit, got ${rows.mkString(",")}")
      // the left sentinels themselves null-emit too — keys differ by side
      assert(nulls.contains(-1.0))
    } finally q.stop()
  }
}
