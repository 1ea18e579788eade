package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.connectors.Testing
import graft.functions.{Profile, Validate}
import graft.streaming.StreamingQuality

/** Streaming quality monitors: per-batch constraint reports ≡ the
  * batch operator on each batch's rows, and the PSI drift monitor ≡
  * batch psiBetween against the frozen reference.
  */
class StreamingQualitySpec extends SparkSpec {
  import spark.implicits._

  test("validateStream: per-batch reports ≡ batch Validate.report on those rows") {
    val src = Testing.testingSource[(Long, Option[String], Double)](spark)
    val reports = scala.collection.mutable.ArrayBuffer.empty[(Long, Row)]
    val q = StreamingQuality.validateStream(
      src.toDS().toDF("id", "name", "score"),
      Seq(Validate.NotNull("name"), Validate.Bounds("score", 0.0, 10.0)),
      onReport = (rep, bid) => reports.synchronized {
        reports ++= rep.collect().map(bid -> _)
      },
      trigger = Trigger.ProcessingTime(0))
    val b1 = Seq((1L, Option("a"), 5.0), (2L, Option.empty[String], 99.0))
    val b2 = Seq((3L, Option("c"), 3.0))
    try {
      src.addBatch(b1: _*); q.processAllAvailable()
      src.addBatch(b2: _*); q.processAllAvailable()
    } finally q.stop()
    // batch 0: one null name, one out-of-range score; batch 1: clean
    def rep(bid: Long, kind: String) = reports
      .find(r => r._1 == bid && r._2.getString(0) == kind).get._2
    assert(rep(0, "not_null").getLong(2) === 1L && !rep(0, "not_null").getBoolean(4))
    assert(rep(0, "bounds").getLong(2) === 1L)
    assert(rep(1, "not_null").getLong(2) === 0L && rep(1, "not_null").getBoolean(4))
    assert(rep(1, "bounds").getLong(2) === 0L)
    // parity: each streamed report row ≡ the batch operator on that batch
    val batchRep = Validate.report(b1.toDF("id", "name", "score"),
      Seq(Validate.NotNull("name"), Validate.Bounds("score", 0.0, 10.0)))
      .withColumn("batch_id", lit(0L)).collect().toSet
    assert(reports.filter(_._1 == 0L).map(_._2).toSet === batchRep)
  }

  test("noveltyMonitor: persisted ref round-trips; streamed scores ≡ batch operator") {
    import graft.functions.Dedup
    val ref = Seq((100L, "a b c"), (101L, "c d e")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-novref").toString
    Dedup.writeNoveltyRef(ref, $"text", n = 2, dir)
    val loaded = Dedup.readNoveltyRef(spark, dir)
    assert(loaded.n === 2 && loaded.bloom.nonEmpty)

    val docs = Seq((1L, "a b c d"), (2L, "x y z"), (3L, "d e q a b"))
    // persisted serve ≡ the one-shot operator
    val served = Dedup.noveltyStatsServe(docs.toDF("doc_id", "text"),
        $"doc_id", $"text", loaded)
      .select($"id", $"n_grams", $"n_seen").as[(Long, Long, Long)].collect().toSet
    val oneShot = Dedup.noveltyStats(docs.toDF("doc_id", "text"),
        $"doc_id", $"text", ref, $"text", n = 2)
      .select($"id", $"n_grams", $"n_seen").as[(Long, Long, Long)].collect().toSet
    assert(served === oneShot && served.nonEmpty)

    // streaming union over arbitrary splits ≡ batch
    val src = Testing.testingSource[(Long, String)](spark)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = graft.streaming.StreamingQuality.noveltyMonitor(
      src.toDS().toDF("doc_id", "text"), "doc_id", "text", loaded,
      onBatch = (out, _) => buf.synchronized { buf ++= out.collect(); () },
      trigger = Trigger.ProcessingTime(0))
    try {
      src.addBatch(docs.take(2): _*); q.processAllAvailable()
      src.addBatch(docs.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = buf.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === served)
  }

  test("driftMonitor: per-batch PSI ≡ batch psiBetween vs the frozen reference") {
    val ref = Seq(1.0, 1.0, 1.0, 7.0).toDF("x")
    val refHist = StreamingQuality.referenceHist(ref, "x", 0.0, 10.0, 2)
    assert(refHist.length === 4 && refHist.sum === 4L)

    val src = Testing.testingSource[Double](spark)
    val readings = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val q = StreamingQuality.driftMonitor(src.toDS().toDF("x"), "x",
      refHist, 0.0, 10.0, 2,
      onReading = (bid, n, psi) => readings.synchronized {
        readings += ((bid, n, psi)); ()
      },
      trigger = Trigger.ProcessingTime(0))
    val b1 = Seq(1.0, 1.0, 1.0, 7.0) // same shape as ref → psi 0
    val b2 = Seq(1.0, 7.0, 7.0, 7.0) // shifted
    try {
      src.addBatch(b1: _*); q.processAllAvailable()
      src.addBatch(b2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(readings.map(r => (r._1, r._2)).toSeq === Seq((0L, 4L), (1L, 4L)))
    assert(readings(0)._3 === 0.0)
    val expected = Profile.psiBetween(ref, b2.toDF("x"), $"x", 0.0, 10.0, 2)
      .as[Double].head()
    assert(math.abs(readings(1)._3 - expected) < 1e-15)
    assert(readings(1)._3 > 0.5) // the shift reads as drift
  }

  test("anomalyMonitor: frozen stats flag across batches; unseen groups never flag") {
    val ref = Seq(("a", 1L), ("a", 3L), ("a", 7L), ("a", 100L))
      .toDF("g", "v")
    val stats = StreamingQuality.referenceRobustStats(ref, "g", "v")
    assert(stats === Map("a" -> ((3L, 2L)))) // med 3, MAD 2 (EventsSpec case)

    val src = Testing.testingSource[(String, Long)](spark)
    val flags = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Boolean)]
    val q = StreamingQuality.anomalyMonitor(src.toDS().toDF("g", "v"),
      "g", "v", stats, k = 2L,
      onBatch = (df, bid) => flags.synchronized {
        flags ++= df.select($"g", $"v", $"is_anomaly").collect()
          .map(r => (bid, r.getString(0), r.getLong(1), r.getBoolean(2)))
        ()
      },
      trigger = Trigger.ProcessingTime(0))
    try {
      // k=2 → threshold 4: |7−3|=4 stays (strict >), |100−3| flags.
      // The frozen median must NOT move with the batch's own values.
      src.addBatch(("a", 7L), ("a", 100L)); q.processAllAvailable()
      // a batch that is ALL outliers still flags (self-referenced
      // stats would absorb it) + an unseen group never flags
      src.addBatch(("a", 500L), ("a", 600L), ("zzz", 0L))
      q.processAllAvailable()
    } finally q.stop()
    assert(flags.sortBy(t => (t._1, t._3)).toSeq === Seq(
      (0L, "a", 7L, false), (0L, "a", 100L, true),
      (1L, "zzz", 0L, false), (1L, "a", 500L, true), (1L, "a", 600L, true)))
  }
}
