package graft

import java.sql.Timestamp
import graft.examples.Examples
import graft.examples.Examples.{ClickEvent, Reading}

class ExamplesSpec extends SparkSpec {
  import spark.implicits._

  test("qualityGateFused ≡ intersection of the three filters, in one exchange-free scan") {
    import org.apache.spark.sql.functions._
    import graft.functions.{Classify, LmFused, Text}
    val docs = Tables.load(spark, sf0001, "documents")
    val stop = Text.langStopwords.head._2
    val nbm = Classify.broadcastModel(
      Classify.nbTrain(docs.filter($"doc_id" % 2 === 0), $"lang", $"text"))
    val lmm = LmFused.broadcastModel(
      Text.lmTrain(docs.filter($"doc_id" % 2 === 0), $"text"))
    val t = Text.GopherThresholds(minTokens = 20, meanLenMinPm = 4000L)
    // median ppl so every leg of the gate is differentially live
    val ppls = LmFused.lmScoreFused(docs, $"doc_id", $"text", lmm)
      .select($"ppl").as[Double].collect().sorted
    val maxPpl = ppls(ppls.length / 2)

    val gate = Examples.qualityGateFused(docs, $"text", stop,
      nbm, "en", lmm, maxPpl, t)
    val got = gate.select($"doc_id").as[Long].collect().toSet

    val a = Text.gopherFilter(docs, $"text", stop, t)
      .select($"doc_id").as[Long].collect().toSet
    val b = Classify.classifierFilterFused(docs, $"text", nbm, "en",
      minMargin = Double.NegativeInfinity)
      .select($"doc_id").as[Long].collect().toSet
    val c = LmFused.perplexityFilter(docs, $"text", lmm, maxPpl)
      .select($"doc_id").as[Long].collect().toSet
    assert(got === (a intersect b intersect c))
    assert(got.nonEmpty && got.size < docs.count())
    // every leg must cut something, or the composition proves nothing
    assert(a.size < docs.count() && b.size < docs.count() && c.size < docs.count())

    // plan shape: scan → filter, zero exchanges / joins / aggregates
    val plan = gate.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Aggregate"), plan)
    // executedPlan.toString marks whole-stage-codegen with a "*(n)" prefix
    assert(plan.contains("*(1) Filter"), plan)
  }

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

  test("split demo re-joins the three projections of each message (reference examples/split_demo.py)") {
    val msgs = Seq(
      ("a", "a_value", Map("key" -> 1), 2, 0L),
      ("b", "b_value", Map("key" -> 1), 3, 1L),
      ("a", "a_value", Map("key" -> 1), 1, 2L)) // key a polled again
      .toDF("key", "value", "headers", "num", "arrival")
    val got = Examples.splitDemo(msgs)
      .as[(String, String, String, String)].collect().toSeq
    // emit complete: one row per message, the moment its third side lands
    assert(got.count(_._1 == "a") === 2)
    assert(got.count(_._1 == "b") === 1)
    assert(got.contains(("b", "b_value", """{"key":1}""", "3")))
    assert(got.map(_._4).toSet === Set("1", "2", "3"))
  }

  test("wikistream counts per server per 2s window, keeps running max (reference examples/wikistream.py)") {
    def at(ms: Long) = new Timestamp(
      Timestamp.valueOf("2024-01-01 10:00:00").getTime + ms)
    // window 1: en×3, de×1; window 2: en×1, de×2
    val changes = (Seq.fill(3)(0L) ++ Seq(500L)).map(m => (at(m), "en.wikipedia.org")) ++
      Seq((at(100L), "de.wikipedia.org")) ++
      Seq((at(2500L), "en.wikipedia.org"), (at(2600L), "de.wikipedia.org"), (at(2700L), "de.wikipedia.org"))
    val df = changes.map { case (t, srv) => (t, s"""{"server_name":"$srv"}""") }
      .toDF("ts", "json")
    val got = Examples.wikistream(df, "ts", "json").as[String].collect().toSet
    // one update per (server, window), like the reference's prints:
    // en: 4 then 1 → max stays 4 (emitted twice, same string);
    // de: 1 then 2 → max rises
    assert(got === Set("en.wikipedia.org, 4",
      "de.wikipedia.org, 1", "de.wikipedia.org, 2"))
  }

  test("sensor event-time windows average per type (reference examples/event_time_processing.py)") {
    def iso(s: Int) = f"2023-01-01T00:00:$s%02d+00:00"
    val raw = Seq(
      s"""{"type":"temp","value":10.0,"time":"${iso(1)}"}""",
      s"""{"type":"temp","value":20.0,"time":"${iso(3)}"}""",
      s"""{"type":"temp","value":30.0,"time":"${iso(7)}"}""",
      s"""{"type":"hum","value":50.0,"time":"${iso(2)}"}""").toDF("value")
    val got = Examples.sensorWindowAvg(raw, "value").as[String].collect().toSet
    assert(got.exists(s => s.startsWith("Average temp: 15.00\tNum events: 2")))
    assert(got.exists(s => s.startsWith("Average temp: 30.00\tNum events: 1")))
    assert(got.exists(s => s.startsWith("Average hum: 50.00\tNum events: 1")))
    assert(got.forall(s => s.contains("From 2023-01-01") && s.contains("to 2023-01-01")))
  }

  test("periodic source emits counters on the frequency grid and stops at n (reference examples/periodic_input.py + custom_metrics.py)") {
    val out = Examples.periodicCounter(spark, frequencyTicks = 2, n = 9)
    val got = graft.streaming.StreamingOps
      .runToMemoryUntil(out, "periodic", expectedRows = 9, timeoutMs = 30000)
      .as[(Long, Long)].collect().sortBy(_._1)
    // exactly n emissions even though the rate source keeps ticking
    assert(got.map(_._1).toSeq === (1L to 9L))
    assert(got.forall(_._2 >= 0L)) // the delay gauge is well-defined
  }

  test("partials: every way to attach a map step yields the same stream (reference examples/partials.py)") {
    import graft.api.{ops, Flow, Stream}
    import org.apache.spark.sql.{DataFrame, Row}
    import org.apache.spark.sql.functions.col
    val flow = Flow("basic")
    val inp = Stream[Row]((0 until 10).toDF("x"), flow, "inp")
    val addOne = col("x") + 1
    // v0: the facade op; v1: a reusable step function; v2: thenDo with a
    // lambda; v3: thenDo with partial application
    val v0 = ops.map("v0", inp, addOne.as("x"))
    val step = (id: String, up: Stream[Row]) => ops.map(id, up, addOne.as("x"))
    val v1 = step("v1", inp)
    val v2 = inp.thenDo("v2", (d: org.apache.spark.sql.Dataset[Row]) =>
      d.select(addOne.as("x")))
    def mapWith(c: org.apache.spark.sql.Column)(id: String, up: Stream[Row]) =
      ops.map(id, up, c.as("x"))
    val v3 = mapWith(addOne)("v3", inp)
    val want = (1 to 10).toSet
    for (v <- Seq(v0, v1, v2, v3))
      assert(v.ds.toDF().as[Int].collect().toSet === want)
    // the input handle was constructed directly (no op), so only the
    // four map steps land in the registry
    assert(flow.stepIds.toSet === Set("v0", "v1", "v2", "v3"))
  }

  test("facade asofJoin/rangeJoin record two-upstream steps and compute") {
    import graft.api.{ops, Flow, Stream}
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    val flow = Flow("joins")
    val l = Stream[Row](Seq((1L, "a", 10L), (2L, "a", 5L)).toDF("id", "k", "lt"), flow, "l")
    val r = Stream[Row](Seq(("a", 7L, 1.5)).toDF("rk", "rt", "v"), flow, "r")
    val j = ops.asofJoin("aj", l, r, Seq("k" -> "rk"), "lt", "rt")
    assert(j.ds.toDF().select(col("id"), col("v")).as[(Long, Option[Double])]
      .collect().toSet === Set((1L, Some(1.5)), (2L, None)))
    val pts = Stream[Row](Seq((10L, 3L)).toDF("pid", "x"), flow, "p")
    val ivs = Stream[Row](Seq((20L, 0L, 5L), (21L, 4L, 9L)).toDF("iid", "lo", "hi"), flow, "i")
    val g = ops.rangeJoin("rj", pts, ivs, "x", "lo", "hi", 4L)
    assert(g.ds.toDF().select(col("pid"), col("iid")).as[(Long, Long)]
      .collect().toSet === Set((10L, 20L)))
    assert(flow.stepIds.toSet.intersect(Set("aj", "rj")) === Set("aj", "rj"))
  }

  test("facade corpus-maintenance steps: lineDedup -> chunkDocs -> snapshotDiff pipeline") {
    import graft.api.{ops, Flow, Stream}
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.{col, md5}
    val flow = Flow("maint")
    val docs = Stream[Row](Seq(
      (1L, "keep\nBOILER\nw1 w2 w3 w4 w5"),
      (2L, "BOILER\nother text here"),
      (3L, "BOILER\nlast")).toDF("doc_id", "text"), flow, "docs")
    val clean = ops.lineDedup("ld", docs, "doc_id", "text", minCount = 3)
    val cleaned = clean.ds.toDF().collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("text")).toMap
    assert(cleaned(1L) == "keep\nw1 w2 w3 w4 w5" && cleaned(3L) == "last")
    val chunks = ops.chunkDocs("ch", clean, "id", "text", chunkTokens = 3, stride = 3)
    assert(chunks.ds.toDF().count() == 4L) // doc1: 6 toks -> 2; doc2: 3 -> 1; doc3: 1 -> 1
    val oldSnap = Stream[Row](Seq((1L, "a"), (2L, "b")).toDF("id", "fp"), flow, "old")
    val newSnap = Stream[Row](Seq((2L, "b2"), (3L, "c")).toDF("id", "fp"), flow, "new")
    val diff = ops.snapshotDiff("sd", oldSnap, newSnap, "id", "fp")
    assert(diff.ds.toDF().collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("status")).toMap ==
      Map(1L -> "removed", 2L -> "changed", 3L -> "added"))
    assert(flow.stepIds.toSet.intersect(Set("ld", "ch", "sd")) === Set("ld", "ch", "sd"))
  }

  test("facade quality/dedup steps: gopherFilter, lmScore, semanticDecontam, assetNearDup") {
    import graft.api.{ops, Flow, Stream}
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    val flow = Flow("qual")
    val stop = graft.functions.Text.langStopwords.head._2
    val docsDf = Tables.load(spark, sf0001, "documents")
    val docs = Stream[Row](docsDf, flow, "docs")
    val kept = ops.gopherFilter("gf", docs, "text", stop,
      graft.functions.Text.GopherThresholds(minTokens = 20))
    assert(kept.ds.toDF().count() > 0)
    val model = graft.functions.Text.lmTrain(docsDf, col("text"))
    val scored = ops.lmScore("lm", kept, "doc_id", "text", model)
    assert(scored.ds.toDF().columns.contains("ppl"))
    assert(scored.ds.toDF().count() > 0)
    val embDf = Tables.load(spark, sf0001, "embeddings")
    val train = Stream[Row](embDf.filter(col("vec_id") % 50 =!= 0), flow, "tr")
    val ev = Stream[Row](embDf.filter(col("vec_id") % 50 === 0), flow, "ev")
    val dec = ops.semanticDecontam("sdc", train, ev,
      "vec_id", "embedding", "vec_id", "embedding", threshold = 0.3)
    assert(dec.ds.toDF().columns.toSeq === Seq("id", "n_hits"))
    val blobs = Stream[Row](docsDf.select(col("doc_id"),
      col("text").cast("binary").as("blob")), flow, "bl")
    val pairs = ops.assetNearDup("and", blobs, "doc_id", "blob")
    assert(pairs.ds.toDF().count() > 0)
    assert(flow.stepIds.toSet.intersect(Set("gf", "lm", "sdc", "and")) ===
      Set("gf", "lm", "sdc", "and"))
  }

  test("curation pipeline example: drop in, sequences + report out") {
    import org.apache.spark.sql.functions.{col, lit}
    val docs = Tables.load(spark, sf001, "documents")
    val evalDocs = docs.filter(col("doc_id") % 17 === 0)
    val train = docs.filter(col("doc_id") % 17 =!= 0)
    val (sequences, report) = Examples.curationPipeline(train, evalDocs)
    val seqRows = sequences.collect()
    assert(seqRows.nonEmpty)
    // every sequence respects the budget envelope (overflow bounded by
    // its last chunk, which is <= chunkTokens = 64)
    assert(seqRows.forall(_.getAs[Long]("n_tokens") <= 256L + 64L))
    val rep = report.head()
    val nTok = rep.getAs[Long]("n_tokens")
    val vocabEst = rep.getAs[Double]("approx_vocab")
    assert(nTok > 10000L && vocabEst > 10 && vocabEst < 100, s"n=$nTok v=$vocabEst")
    // the persisted artifacts are probe-ready
    import graft.functions.{Bloom, Cms, SimHash}
    val probed = report.select(
      Cms.cmsEstimate(col("freq_sketch"), SimHash.fnv1a64(lit("the"))).as("est"),
      Bloom.bloomContains(col("seen_filter"), SimHash.fnv1a64(lit("the"))).as("seen"))
      .head()
    assert(probed.getAs[Long]("est") > 0L && probed.getAs[Boolean]("seen"))
  }

  test("mixture pipeline example: gate, score, mix to budget, shard deterministically") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, sf001, "documents")
    val (sharded, report) = Examples.mixturePipeline(docs,
      targetTokens = 10000L, sharesPm = Map("src0" -> 300L), defaultSharePm = 30L)
    val rows = sharded.collect()
    assert(rows.nonEmpty)
    // shards carry the deterministic (shard, pos) permutation
    assert(sharded.columns.contains("shard") && sharded.columns.contains("pos"))
    val rerun = Examples.mixturePipeline(docs, 10000L, Map("src0" -> 300L), 30L)._1
      .select(col("doc_id"), col("shard"), col("pos")).collect().toSet
    assert(rerun === rows.map(r => org.apache.spark.sql.Row(
      r.getAs[Long]("doc_id"), r.getAs[Long]("shard"), r.getAs[Long]("pos"))).toSet)
    // report: mixed token mass per source never exceeds gated mass
    report.collect().foreach { r =>
      val tg = r.getAs[Long]("tok_gated")
      val tm = Option(r.getAs[Long]("tok_mixed")).getOrElse(0L)
      assert(tm <= tg)
    }
  }

  test("benchmark_windowing port: window structure correct, output discarded") {
    import org.apache.spark.sql.functions._
    // 600 second-spaced events = 10 full 1-minute tumbling windows; the
    // final filter_all discards everything (the reference measures
    // throughput, not output)
    assert(Examples.windowingBench(spark, 600).count() === 0L)
    // reconstruct the pre-filter stages: every event lands in exactly
    // one (key, minute) window and the flatten returns all of them
    val inp = spark.range(600)
      .select(timestamp_seconds(lit(1640995200L) + col("id")).as("ts"))
      .select(pmod(xxhash64(col("ts")), lit(2)).cast("string").as("key"), col("ts"))
    val wo = graft.windowing.Windowing.collectWindow(inp,
      graft.windowing.EventClock("ts", waitFor = "0 seconds"),
      graft.windowing.TumblingWindower("1 minute"),
      Seq(col("key")), col("ts"), as = "values")
    val sizes = wo.select(col("window.start").cast("long").as("w"), col("key"),
      size(col("values")).as("n"))
    assert(sizes.agg(sum(col("n"))).as[Long].head() === 600L)
    // 10 minutes × up to 2 keys, windows aligned on exact minute bounds
    val wins = sizes.select((col("w") - 1640995200L) % 60).as[Long].collect()
    assert(wins.forall(_ === 0L))
    assert(sizes.select(countDistinct(col("w"))).as[Long].head() === 10L)
  }

  test("snapshotAdmission: validation + cards + fingerprint + drift in one checklist") {
    import graft.functions.{Profile, Validate}
    import spark.implicits._
    val prev = Seq(
      (1L, "src0", 10L), (2L, "src0", 20L), (3L, "src1", 30L))
      .toDF("doc_id", "source", "n_chars")
    val drop = Seq(
      (4L, "src0", 15L), (5L, "src1", 99999L), // out-of-bounds length
      (5L, "src1", 25L))                       // duplicate id
      .toDF("doc_id", "source", "n_chars")
    val checks = Seq(Validate.NotNull("doc_id"), Validate.Unique("doc_id"),
      Validate.Bounds("n_chars", 0.0, 1000.0))
    val adm = Examples.snapshotAdmission(drop, checks, $"source",
      Seq("doc_id", "n_chars"), Seq("doc_id", "source"),
      prevProfile = Some(Profile.profile(prev, Seq("doc_id", "n_chars"))))
    // validation caught both planted defects
    val failed = adm.validation.filter(!$"passed")
      .select($"kind").as[String].collect().toSet
    assert(failed === Set("unique", "bounds"))
    // per-source cards cover both strata
    assert(adm.cards.select($"stratum").distinct().as[String].collect().toSet
      === Set("src0", "src1"))
    // fingerprint is the standalone operator's value
    assert(adm.fingerprint.select($"fp").as[String].head() ===
      Profile.fingerprint(drop, Seq("doc_id", "source"))
        .select($"fp").as[String].head())
    // drift vs the previous snapshot surfaces the range blow-up
    val mx = adm.drift.filter($"col_name" === "n_chars")
      .select($"max_shift").as[Double].head()
    assert(mx === 99999.0 - 30.0)
    // failFast throws on the planted defects
    intercept[IllegalStateException] {
      Examples.snapshotAdmission(drop, checks, $"source",
        Seq("doc_id"), Seq("doc_id"), failFast = true)
    }
  }
}
