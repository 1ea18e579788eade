package graft

import java.sql.Timestamp
import graft.examples.Examples
import graft.examples.Examples.{ClickEvent, Reading}

class ExamplesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 10:00:${s % 60}%02d").
    asInstanceOf[Timestamp]

  test("search_session: sessions split on gap, CTR per session") {
    def at(sec: Int) = new Timestamp(
      Timestamp.valueOf("2024-01-01 10:00:00").getTime + sec * 1000L)
    val events = Seq(
      ClickEvent(1, at(0), "app_open", ""),
      ClickEvent(1, at(1), "search", "dogs"),
      ClickEvent(1, at(3), "click", "rover"),
      ClickEvent(1, at(4), "search", "cats"),
      // gap > 10s -> new session
      ClickEvent(1, at(60), "search", "fish"),
      ClickEvent(2, at(2), "search", "x"),
      ClickEvent(2, at(5), "click", "y")).toDS()
    val got = Examples.searchSessionCtr(events, "10 seconds")
      .select("user", "searches", "clicks", "ctr")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === Set(
      (1L, 2L, 1L, 0.5), // session 1 of user 1
      (1L, 1L, 0L, 0.0), // session 2 of user 1
      (2L, 1L, 1L, 1.0)))
  }

  test("anomaly_detector flags z-score outliers per metric") {
    val base = (1 to 12).map(i => Reading("m", i.toLong, 10.0 + (i % 2))) // ~stable
    val spike = Reading("m", 13L, 100.0)
    val readings = (base :+ spike).toDF()
    val flagged = Examples.anomalyDetector(readings).collect()
    val spikeRow = flagged.find(_.seq == 13L).get
    assert(spikeRow.anomalous, s"spike not flagged: $spikeRow")
    assert(flagged.count(_.anomalous) === 1)
  }

  test("events_to_parquet writes day-partitioned output") {
    val out = java.nio.file.Files.createTempDirectory("graft-e2p").toFile.getPath + "/out"
    Examples.eventsToParquet(spark, sf0001, out)
    val back = spark.read.parquet(out)
    assert(back.count() === Tables.load(spark, sf0001, "events").count())
    assert(back.columns.contains("day"))
  }
}
