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

  test("orderbook maintains best bid/ask per product across deltas") {
    val deltas = Seq(
      ("BTC", 1L, "buy", 100.0, 2.0),
      ("BTC", 2L, "sell", 101.0, 1.0),
      ("BTC", 3L, "buy", 100.5, 1.5),
      ("BTC", 4L, "buy", 100.5, 0.0), // remove best bid
      ("ETH", 1L, "sell", 10.0, 5.0))
      .toDF("product", "seq", "side", "price", "size")
    val out = graft.examples.OrderBook.topOfBook(deltas).collect()
      .map(s => (s.product, s.seq) -> s).toMap
    assert(out(("BTC", 3L)).bidPrice === 100.5)
    assert(out(("BTC", 4L)).bidPrice === 100.0) // fell back after removal
    assert(out(("BTC", 4L)).askPrice === 101.0)
    assert(math.abs(out(("BTC", 4L)).spread - 1.0) < 1e-9)
    assert(out(("ETH", 1L)).askPrice === 10.0)
  }

  test("1brc fold computes min/mean/max per station") {
    val got = graft.examples.Examples.oneBrc(
      Tables.load(spark, sf0001, "events"), "event_type", "value")
    assert(got.count() === 5)
    val row = got.filter($"station" === "click").head()
    assert(row.getDouble(1) <= row.getDouble(2) && row.getDouble(2) <= row.getDouble(3))
  }

  test("events_to_parquet writes day-partitioned output") {
    val out = java.nio.file.Files.createTempDirectory("graft-e2p").toFile.getPath + "/out"
    Examples.eventsToParquet(spark, sf0001, out)
    val back = spark.read.parquet(out)
    assert(back.count() === Tables.load(spark, sf0001, "events").count())
    assert(back.columns.contains("day"))
  }

  test("confluent_serde pipeline: registry avro in, window avg, registry avro out") {
    import graft.connectors.KafkaOps
    val reg = new KafkaOps.InMemorySchemaRegistry
    reg.register("sensor-key", Examples.sensorKeySchema)
    reg.register("sensor-value", Examples.sensorValueSchema)
    reg.register("aggregated-value", Examples.aggregatedSchema)
    val keySer = new KafkaOps.RegistryAvroSerializer(reg, "sensor-key")
    val valSer = new KafkaOps.RegistryAvroSerializer(reg, "sensor-value")
    def keyRec(ident: String) = {
      val r = new org.apache.avro.generic.GenericData.Record(
        new org.apache.avro.Schema.Parser().parse(Examples.sensorKeySchema))
      r.put("identifier", ident); r.put("name", "topic_key"); r
    }
    def valRec(ts: Long, ident: String, v: Long) = {
      val r = new org.apache.avro.generic.GenericData.Record(
        new org.apache.avro.Schema.Parser().parse(Examples.sensorValueSchema))
      r.put("timestamp", ts); r.put("identifier", ident); r.put("value", v); r
    }
    // sensor s1: values 10, 20 in the same second → avg 15; s2: 7
    val raw = Seq(
      (keySer(keyRec("s1")), valSer(valRec(1000L, "s1", 10L)), "t", 0, 0L),
      (keySer(keyRec("s1")), valSer(valRec(1500L, "s1", 20L)), "t", 0, 1L),
      (keySer(keyRec("s2")), valSer(valRec(1200L, "s2", 7L)), "t", 0, 2L)
    ).toDF("key", "value", "topic", "partition", "offset")
    val (out, errs) = Examples.confluentSerde(raw, reg)
    assert(errs.isEmpty)
    val de = new KafkaOps.RegistryAvroDeserializer(reg)
    val got = out.collect().map { bytes =>
      val r = de(bytes)
      (r.get("identifier").toString, r.get("avg").asInstanceOf[Double],
        r.get("window_start").asInstanceOf[Long])
    }.toSet
    assert(got === Set(("s1", 15.0, 1000L), ("s2", 7.0, 1000L)))
  }

  test("wordcount tokenizes with the reference regex and counts words") {
    val lines = Seq("To be, or not to be!", "3 be?").toDF("line")
    val got = Examples.wordCount(lines, "line")
      .as[(String, Long)].collect().toMap
    assert(got === Map("to" -> 2L, "be" -> 3L, "or" -> 1L, "not" -> 1L))
  }

  test("apriori counts items and normalized pairs per basket") {
    val baskets = Seq("milk, bread", "bread,milk,eggs", "eggs").toDF("line")
    val (items, pairs) = Examples.apriori(baskets, "line")
    val itemMap = items.as[(String, Long)].collect().toMap
    assert(itemMap === Map("milk" -> 2L, "bread" -> 2L, "eggs" -> 2L))
    val pairMap = pairs.as[(String, Long)].collect().toMap
    // ("milk","bread") and ("bread","milk") normalize to the same pair
    assert(pairMap === Map("bread,milk" -> 2L, "bread,eggs" -> 1L, "eggs,milk" -> 1L))
  }

  test("join cascade gathers four sides per key (reference examples/join.py)") {
    // the example's three TestingSources, one item each
    val users = Seq((123L, "Bumble")).toDF("user_id", "name")
    val emails = Seq((123L, "bee@bytewax.com")).toDF("user_id", "email")
    val attrs = Seq((123L, "yellow", "buzz")).toDF("user_id", "color", "sound")
    val got = Examples.joinCascade(spark, users, emails, attrs)
      .as[(String, String, String, String, String)].collect().toSet
    // documented output: ('123', ('Bumble', 'bee@bytewax.com', 'yellow', 'buzz'))
    assert(got === Set(("123", "Bumble", "bee@bytewax.com", "yellow", "buzz")))
    // a key missing one side never completes
    val partial = Examples.joinCascade(spark,
      users.union(Seq((456L, "Stinger")).toDF("user_id", "name")), emails, attrs)
      .as[(String, String, String, String, String)].collect().toSet
    assert(partial === Set(("123", "Bumble", "bee@bytewax.com", "yellow", "buzz")))
  }

  test("basic branch router halves evens, doubles odds (reference examples/basic.py)") {
    val got = Examples.basicRouter((0 until 10).toDF("x"))
      .as[String].collect().toSet
    // evens 0,2,4,6,8 → halve → −1 → {-1,0,1,2,3}
    // odds 1,3,5,7,9 → double → −1 → {1,5,9,13,17}
    val want = (Seq(-1, 0, 1, 2, 3) ++ Seq(1, 5, 9, 13, 17))
      .map(x => s"<dance>$x</dance>").toSet
    assert(got === want)
  }

  test("hn scraper backfills, ranges polls, splits stories (reference examples/poll_and_split.py)") {
    import Examples.HnItem
    // fetch mock at the reference's download_metadata boundary:
    // ids divisible by 7 fail to download; even ids are stories
    def fetch(id: Long): Option[HnItem] =
      if (id % 7 == 0) None
      else Some(HnItem(id, if (id % 2 == 0) "story" else "comment", s"u$id"))
    // polls: first sees max 100 (backfill 90..99), then 103 (100..102),
    // then no progress (nothing), then 105 (103..104)
    val polls = Seq((0L, 100L), (1L, 103L), (2L, 103L), (3L, 105L))
      .toDF("poll_seq", "max_id")
    val (stories, comments) = Examples.hnScraper(polls, fetch)
    val wantIds = ((90L until 100L) ++ (100L until 103L) ++ (103L until 105L))
      .filter(_ % 7 != 0)
    assert(stories.collect().map(_.id).toSet === wantIds.filter(_ % 2 == 0).toSet)
    assert(comments.collect().map(_.id).toSet === wantIds.filter(_ % 2 != 0).toSet)
    assert(stories.collect().forall(_.kind == "story"))
  }

  test("batch operator chunks at size limit and re-batches averages (reference examples/batch_operator.py)") {
    // the example's CounterSource: 0..19 in arrival order, batch size 3
    val nums = (0 until 20).map(i => (i.toLong, i)).toDF("seq", "x")
    val avgs = Examples.collectChunks(
        nums.selectExpr("'ALL' as k", "seq", "cast(x as double) as x"),
        "k", $"seq", $"x", 3)
      .orderBy("chunk")
      .collect().map(r => r.getSeq[Double](r.fieldIndex("values")))
    // 20 items → 6 full batches of 3 + trailing 2
    assert(avgs.map(_.size).toSeq === Seq(3, 3, 3, 3, 3, 3, 2))
    assert(avgs.head === Seq(0.0, 1.0, 2.0))
    val out = Examples.batchAvgs(nums, "seq", "x", batchSize = 3, avgBatchSize = 10)
      .orderBy("chunk").as[(Long, String)].collect()
    // 7 batch averages → one re-batch of ≤10, reference string format
    assert(out.length === 1)
    assert(out.head._2.startsWith("Avg batch:\t"))
    assert(out.head._2.contains("1.0")) // avg of (0,1,2)
    assert(out.head._2.contains("18.5")) // avg of trailing (18,19)
  }
}
