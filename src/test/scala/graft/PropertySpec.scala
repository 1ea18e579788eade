package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.JoinOps

/** Property-style model tests: random inputs checked against simple
  * in-memory reference models (scalacheck engine driven directly; the
  * Spark side runs once per generated case).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, tests: Int = 10): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(tests).withInitialSeed(42L), prop)
    assert(res.passed, res.status.toString)
  }

  test("joinRunning matches the in-memory state-machine model on random interleavings") {
    val genEvents = for {
      n <- Gen.choose(1, 30)
      evs <- Gen.listOfN(n, for {
        key <- Gen.oneOf("k1", "k2", "k3")
        side <- Gen.oneOf(0, 1)
        v <- Gen.choose(0, 99)
      } yield (key, side, v))
    } yield evs.zipWithIndex.map { case ((k, s, v), i) => (k, i.toLong, s, v.toString) }

    val prop = Prop.forAll(genEvents) { evs =>
      // in-memory model: per key in ord order, last value per side,
      // emit snapshot at every arrival
      val model = evs.groupBy(_._1).toSeq.flatMap { case (k, kevs) =>
        val state = Array[String](null, null)
        kevs.sortBy(_._2).map { case (_, ord, side, v) =>
          state(side) = v
          (k, ord, Option(state(0)), Option(state(1)))
        }
      }.toSet

      val a = evs.filter(_._3 == 0).map(e => (e._1, e._2, e._4)).toDF("key", "ord", "va")
      val b = evs.filter(_._3 == 1).map(e => (e._1, e._2, e._4)).toDF("key", "ord", "vb")
      val got = JoinOps.joinRunning(spark, "key", "ord", JoinOps.InsertLast,
        JoinOps.Side(a, "va"), JoinOps.Side(b, "vb"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)), Option(r.getString(3))))
        .toSet
      got == model
    }
    check(prop)
  }

  test("joinComplete matches the emit-and-clear model") {
    val genEvents = for {
      n <- Gen.choose(2, 24)
      evs <- Gen.listOfN(n, for {
        side <- Gen.oneOf(0, 1)
        v <- Gen.choose(0, 99)
      } yield (side, v))
    } yield evs.zipWithIndex.map { case ((s, v), i) => (i.toLong, s, v.toString) }

    val prop = Prop.forAll(genEvents) { evs =>
      val state = Array[String](null, null)
      val model = scala.collection.mutable.Set.empty[(Long, String, String)]
      evs.sortBy(_._1).foreach { case (ord, side, v) =>
        state(side) = v
        if (state(0) != null && state(1) != null) {
          model += ((ord, state(0), state(1)))
          state(0) = null; state(1) = null
        }
      }
      val a = evs.filter(_._2 == 0).map(e => ("k", e._1, e._3)).toDF("key", "ord", "va")
      val b = evs.filter(_._2 == 1).map(e => ("k", e._1, e._3)).toDF("key", "ord", "vb")
      val got = JoinOps.joinComplete(spark, "key", "ord", JoinOps.InsertLast,
        JoinOps.Side(a, "va"), JoinOps.Side(b, "vb"))
        .collect().map(r => (r.getLong(1), r.getString(2), r.getString(3))).toSet
      got == model.toSet
    }
    check(prop)
  }

  test("joinRunning insert=product emits the full cartesian snapshot per arrival") {
    val genEvents = for {
      n <- Gen.choose(1, 14)
      evs <- Gen.listOfN(n, for {
        side <- Gen.oneOf(0, 1)
        v <- Gen.choose(0, 9)
      } yield (side, v))
    } yield evs.zipWithIndex.map { case ((s, v), i) => (i.toLong, s, v.toString) }

    val prop = Prop.forAll(genEvents) { evs =>
      val state = Array(Vector.empty[String], Vector.empty[String])
      val model = scala.collection.mutable.Set.empty[(Long, Option[String], Option[String])]
      evs.sortBy(_._1).foreach { case (ord, side, v) =>
        state(side) = state(side) :+ v
        val s0 = if (state(0).isEmpty) Vector[Option[String]](None) else state(0).map(Some(_))
        val s1 = if (state(1).isEmpty) Vector[Option[String]](None) else state(1).map(Some(_))
        for (a <- s0; b <- s1) model += ((ord, a, b))
      }
      val a = evs.filter(_._2 == 0).map(e => ("k", e._1, e._3)).toDF("key", "ord", "va")
      val b = evs.filter(_._2 == 1).map(e => ("k", e._1, e._3)).toDF("key", "ord", "vb")
      val got = JoinOps.joinRunning(spark, "key", "ord", JoinOps.InsertProduct,
        JoinOps.Side(a, "va"), JoinOps.Side(b, "vb"))
        .collect()
        .map(r => (r.getLong(1), Option(r.getString(2)), Option(r.getString(3)))).toSet
      got == model.toSet
    }
    check(prop)
  }

  test("sliding windows assign each event to exactly length/offset windows") {
    val genTs = Gen.listOfN(40, Gen.choose(0L, 100000L))
    val prop = Prop.forAll(genTs) { secs =>
      val df = secs.map(s => java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s)))
        .toDF("ts")
      val exploded = df.select(window($"ts", "1 hour", "15 minutes").as("w"), $"ts")
      // 1h/15m = 4 windows per event, and each window truly contains the event
      val n = exploded.count()
      val contained = exploded
        .filter($"ts" >= $"w.start" && $"ts" < $"w.end").count()
      n == 4L * secs.size && contained == n
    }
    check(prop, tests = 5)
  }

  test("session windows per key equal the gap-count model") {
    val gapSec = 120L
    val genTs = Gen.listOfN(30, Gen.choose(0L, 20000L)).map(_.distinct)
    val prop = Prop.forAll(genTs) { secs =>
      val sorted = secs.sorted
      // Spark merges sessions whose windows touch: an event exactly `gap`
      // after the previous one still extends the session (inclusive end)
      val modelSessions = if (sorted.isEmpty) 0
        else 1 + sorted.zip(sorted.tail).count { case (a, b) => b - a > gapSec }
      val df = secs.map(s => ("k", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s))))
        .toDF("key", "ts")
      val got = df.groupBy(session_window($"ts", s"$gapSec seconds"), $"key")
        .count().count()
      got == modelSessions.toLong
    }
    check(prop, tests = 5)
  }

  test("round-9 facade ops wire through the flow graph (classify/lm/record-link)") {
    import graft.functions.{Classify, LmFused, RecordLink, Text}
    val flow = graft.api.Flow("r9")
    val docs = graft.api.ops.input("docs", flow, spark, s"$sf0001/documents.parquet")
    val nbm = Classify.broadcastModel(Classify.nbTrain(
      docs.ds.toDF().filter(col("doc_id") % 2 === 0), col("lang"), col("text")))
    val lmm = LmFused.broadcastModel(Text.lmTrain(
      docs.ds.toDF().filter(col("doc_id") % 2 === 0), col("text")))
    val kept = graft.api.ops.classifierFilterFused("cls", docs, "text", nbm, "en")
    val scored = graft.api.ops.perplexityFilter("ppl", kept, "text", lmm, 1e18)
    assert(scored.ds.count() > 0)
    val cust = graft.api.ops.input("cust", flow, spark, s"$sf0001/customer.parquet")
    val links = graft.api.ops.recordLink("er", cust, "c_custkey",
      Seq(concat_ws("|", col("c_nationkey"), col("c_mktsegment"))),
      Seq(col("c_name").as("name")),
      (a, b) => (lit(2) - levenshtein(a.getField("name"), b.getField("name"))).cast("long"),
      lit(0L))
    assert(links.ds.count() > 0)
    val mm = flow.toMermaid
    assert(mm.contains("docs --> cls") && mm.contains("cls --> ppl"))
    assert(mm.contains("cust --> er"))
  }

  test("segment-two facade ops wire through the flow graph (search/sample/join/upsert)") {
    import graft.functions.{Search, Similarity}
    val flow = graft.api.Flow("r9b")
    val docsDf = Tables.load(spark, sf0001, "documents")
    val idx = Search.buildIndex(docsDf, col("doc_id"), col("text"))
    val qs = graft.api.ops.input("qs", flow, spark, s"$sf0001/documents.parquet")
    val q2 = graft.api.ops.map("qtext", qs, col("doc_id").as("qid"),
      array_join(slice(graft.functions.Text.tokens(col("text")), 3, 4), " ").as("qtext"))
    val hits = graft.api.ops.bm25TopK("bm25", q2, idx, "qid", "qtext", k = 3)
    assert(hits.ds.count() > 0)
    val emb = graft.api.ops.input("emb", flow, spark, s"$sf0001/embeddings.parquet")
    val cents = Similarity.ivfCentroids(emb.ds.toDF(), "vec_id", "embedding",
      nlist = 4, iterations = 0)
    val sampled = graft.api.ops.clusterBalancedSample("cbs", emb, "vec_id",
      "embedding", cents, perCluster = 2)
    assert(sampled.ds.count() > 0)
    val fact = graft.api.ops.input("fact", flow, spark, s"$sf0001/events.parquet")
    val dimStream = graft.api.ops.input("ev2", flow, spark, s"$sf0001/events.parquet")
      .thenDo("dim", d => d.select(col("user_id")).distinct())
    val joined = graft.api.ops.saltedJoin("sj", fact, dimStream, Seq("user_id"), salt = 4)
    assert(joined.ds.count() === Tables.load(spark, sf0001, "events").count())
    val mm = flow.toMermaid
    assert(mm.contains("qtext --> bm25") && mm.contains("emb --> cbs"))
    assert(mm.contains("fact --> sj") && mm.contains("dim --> sj"))
  }

  test("flow graph renders recorded steps as mermaid and json") {
    val flow = graft.api.Flow("viz")
    val inp = graft.api.ops.input("in", flow, spark, s"$sf0001/region.parquet")
    val m = graft.api.ops.map("proj", inp, col("r_name"))
    assert(m.ds.count() > 0)
    val mermaid = flow.toMermaid
    assert(mermaid.contains("flowchart"))
    assert(mermaid.contains("in --> proj"))
    val json = flow.toJson
    assert(json.contains("\"flow\": \"viz\""))
    assert(json.contains("\"id\": \"proj\"") && json.contains("\"inputs\": [\"in\"]"))
  }

  test("facade windowing ops run end-to-end and record flow steps") {
    import graft.windowing.{EventClock, TumblingWindower}
    val flow = graft.api.Flow("winflow")
    // raw reads of events.parquet need the legacy conf when the driver
    // data carries TIMESTAMP(NANOS) (Tables.load sets it for the query
    // layer); newer generations carry timestamp[us] directly
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val inp = graft.api.ops.input("in", flow, spark, s"$sf0001/events.parquet")
    // facade users load via Tables — emulate its ts normalization with
    // a map step (nanos long → micros; timestamp[us]/NTZ → timestamp)
    val tsExpr =
      if (inp.ds.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        org.apache.spark.sql.functions.timestamp_micros(
          (col("ts").cast("long") / 1000).cast("long")).as("ts")
      else col("ts").cast(org.apache.spark.sql.types.TimestampType).as("ts")
    val prepared = graft.api.ops.map("prep", inp,
      col("user_id").cast("string").as("key"), tsExpr, col("event_id"))
    val counted = graft.api.ops.countWindow("cw", prepared,
      EventClock("ts"), TumblingWindower("1 day"), Seq(col("key")))
    assert(counted.ds.count() > 0)
    object FirstId extends graft.windowing.WindowLogicOps.WindowLogic[Long, Long, Option[Long]] {
      def init: Option[Long] = None
      def onValue(st: Option[Long], id: Long): (Option[Long], Seq[Long]) =
        (st.orElse(Some(id)), Seq.empty)
      def onClose(st: Option[Long]): Seq[Long] = st.toSeq
    }
    val generic = graft.api.ops.window[Long, Long, Option[Long]]("gw", prepared,
      "key", EventClock("ts"), TumblingWindower("1 day"), Seq(col("event_id")),
      r => r.getAs[Long]("event_id"), FirstId)
    assert(generic.ds.count() > 0)
    assert(flow.toMermaid.contains("prep --> cw"))
    assert(flow.toMermaid.contains("prep --> gw"))
  }

  test("winnowing guarantee: any shared substring of length >= k+w-1 shares a fingerprint") {
    // SIGMOD'03 correctness property, checked over random (k, w,
    // docs): a shared run of k+w-1 chars contains one full window of w
    // identical k-gram hashes, whose minimum both documents select.
    // Runs against WinnowImpl (the exact code the codegen'd expression
    // calls; FunctionsSpec covers the Column/codegen path).
    import org.apache.spark.unsafe.types.UTF8String
    def fps(s: String, k: Int, w: Int): Set[Long] =
      graft.functions.WinnowImpl.winnow(UTF8String.fromString(s), k, w)
        .toLongArray().toSet
    def genStr(n: Int): Gen[String] =
      Gen.listOfN(n, Gen.choose('a', 'f')).map(_.mkString)
    val genCase = for {
      k <- Gen.choose(3, 10)
      w <- Gen.choose(2, 8)
      extra <- Gen.choose(0, 15)
      shared <- genStr(k + w - 1 + extra)
      pre1 <- Gen.choose(0, 50).flatMap(genStr)
      suf1 <- Gen.choose(0, 50).flatMap(genStr)
      pre2 <- Gen.choose(0, 50).flatMap(genStr)
      suf2 <- Gen.choose(0, 50).flatMap(genStr)
    } yield (k, w, pre1 + shared + suf1, pre2 + shared + suf2)
    val prop = Prop.forAll(genCase) { case (k, w, d1, d2) =>
      fps(d1, k, w).intersect(fps(d2, k, w)).nonEmpty
    }
    check(prop, tests = 200)
  }

  test("winnowing density stays near the paper's 2/(w+1) bound on random text") {
    import org.apache.spark.unsafe.types.UTF8String
    val genCase = for {
      w <- Gen.choose(2, 12)
      doc <- Gen.listOfN(800, Gen.choose('a', 'z')).map(_.mkString)
    } yield (w, doc)
    val prop = Prop.forAll(genCase) { case (w, doc) =>
      val k = 8
      val m = doc.length - k + 1
      val d = graft.functions.WinnowImpl.winnow(UTF8String.fromString(doc), k, w)
        .numElements().toDouble / m
      // expected density 2/(w+1) for uniformly distributed hashes;
      // generous concentration margins for 793-gram docs (distinctness
      // can only lower the count)
      d >= 1.0 / (w + 1) && d <= 3.5 / (w + 1)
    }
    check(prop, tests = 50)
  }

  test("mapField lens updates one struct field in place") {
    val df = Seq((1, ("a", 10))).toDF("id", "s")
    val out = graft.operators.Ops.mapField(df, "s", "_2", _ * 2)
      .select(col("id"), col("s._1"), col("s._2")).as[(Int, String, Int)].collect()
    assert(out.toSeq === Seq((1, "a", 20)))
  }
}
