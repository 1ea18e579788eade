package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingOps
import graft.windowing.{EventClock, SessionWindower, TumblingWindower, Windowing}

/** Batch/streaming parity: the same graft operators over the same rows
  * must agree whether the table arrives as a bounded read or as a
  * file-stream — the engine-switch guarantee a reference user relies
  * on (bytewax has one execution mode; we have two and they must not
  * diverge).
  */
class StreamingParitySpec extends SparkSpec {
  import spark.implicits._

  private def batchEvents = Tables.load(spark, sf0001, "events")

  // the file-stream source needs a directory: stage the single parquet
  // file into a temp dir once
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-parity-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  private def streamEvents = {
    // file-stream the same parquet, normalizing ts exactly like
    // Tables.loadEvents (nanos-as-long, timestamp[us]/NTZ, or native)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sf0001/events.parquet").schema
    val raw = spark.readStream.schema(schema).parquet(eventsDir)
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => raw.withColumn("ts",
        $"ts".cast(org.apache.spark.sql.types.TimestampType))
    }
  }

  test("tumbling window counts agree between batch and stream") {
    val clock = EventClock("ts")
    val w = TumblingWindower("1 day")
    val batch = Windowing.countWindow(batchEvents, clock, w, Seq($"event_type"), "n")
      .select(unix_millis($"window.start").as("ws"), $"event_type", $"n")
      .as[(Long, String, Long)].collect().toSet
    val streamed = StreamingOps.windowStream(streamEvents, clock, w,
      Seq($"event_type"), Seq(count(lit(1)).as("n")))
      .select(unix_millis($"window.start").as("ws"), $"event_type", $"n")
    val got = StreamingOps.runToMemory(streamed, "parity_tumbling", OutputMode.Complete())
      .as[(Long, String, Long)].collect().toSet
    assert(got === batch)
  }

  test("session window counts agree between batch and stream") {
    val clock = EventClock("ts")
    val w = SessionWindower("2 hours")
    val batch = Windowing.countWindow(
      batchEvents.select($"user_id".cast("string").as("key"), $"ts"),
      clock, w, Seq($"key"), "n")
      .select($"key", unix_millis($"window.start").as("ws"), $"n")
      .as[(String, Long, Long)].collect().toSet
    val streamed = StreamingOps.windowStream(
      streamEvents.select($"user_id".cast("string").as("key"), $"ts"),
      clock, w, Seq($"key"), Seq(count(lit(1)).as("n")))
      .select($"key", unix_millis($"window.start").as("ws"), $"n")
    val got = StreamingOps.runToMemory(streamed, "parity_session", OutputMode.Complete())
      .as[(String, Long, Long)].collect().toSet
    assert(got === batch)
  }

  test("stateless pipeline (filter+map) agrees between batch and stream") {
    val pipeline = (df: org.apache.spark.sql.DataFrame) =>
      graft.operators.Ops.filter(df, $"value" > 50)
        .select($"event_id", ($"value" * 2).as("v2"))
    val batch = pipeline(batchEvents).as[(Long, Double)].collect().toSet
    val got = StreamingOps.runToMemory(pipeline(streamEvents), "parity_stateless")
      .as[(Long, Double)].collect().toSet
    assert(got === batch)
  }
}
