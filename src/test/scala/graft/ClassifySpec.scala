package graft

import org.apache.spark.sql.functions._
import graft.functions.Classify

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private def tinyModel = {
    // 2 classes, hand-computable counts:
    //   spam: "buy now", "buy buy cheap"  → n_docs 2, n_tok 5
    //         words: buy→3, now→1, cheap→1, V contribution {buy,now,cheap}
    //   ham:  "hello dear friend"          → n_docs 1, n_tok 3
    //         words: hello→1, dear→1, friend→1
    // vocab = {buy, now, cheap, hello, dear, friend} → V = 6
    val train = Seq(
      ("spam", "buy now"), ("spam", "buy buy cheap"),
      ("ham", "hello dear friend")).toDF("label", "text")
    Classify.nbTrain(train, $"label", $"text")
  }

  test("nbTrain counts match hand computation") {
    val m = tinyModel
    assert(m.totalDocs === 3L)
    assert(m.vocabSize === 6L)
    val byLabel = m.classes.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byLabel("spam") === ((2L, 5L)))
    assert(byLabel("ham") === ((1L, 3L)))
    val w = m.words.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(w(("spam", "buy")) === 3L)
    assert(w(("spam", "now")) === 1L)
    assert(w(("ham", "friend")) === 1L)
    assert(w.size === 6)
  }

  test("nbScore log-likelihood matches the closed form exactly") {
    val m = tinyModel
    val doc = Seq((1L, "buy cheap cheap pills")).toDF("id", "text")
    val got = Classify.nbScore(doc, $"id", $"text", m)
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // spam: prior ln(2/3); tokens buy(c=3) tf1, cheap(c=1) tf2, pills(c=0) tf1
    //   ll = ln(2/3) + ln(4/11) + 2·ln(2/11) + ln(1/11)
    val spam = math.log(2.0 / 3) + math.log(4.0 / 11) +
      2 * math.log(2.0 / 11) + math.log(1.0 / 11)
    // ham: prior ln(1/3); all unseen except none; n_tok+V = 9
    //   ll = ln(1/3) + 4·ln(1/9)  (buy,cheap×2,pills all c=0)
    val ham = math.log(1.0 / 3) + 4 * math.log(1.0 / 9)
    assert(math.abs(got("spam")._3 - spam) < 1e-12)
    assert(math.abs(got("ham")._3 - ham) < 1e-12)
    assert(got("spam")._1 === 4L && got("spam")._2 === 3L) // n_pos, n_hit
    assert(got("ham")._2 === 0L)
  }

  test("nbPredict picks argmax with runner-up margin; zero-token docs emit no row") {
    val m = tinyModel
    val docs = Seq((1L, "buy cheap now"), (2L, "dear hello friend hello"),
      (3L, "   ")).toDF("id", "text")
    val got = Classify.nbPredict(docs, $"id", $"text", m)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(3))).toMap
    assert(got(1L)._1 === "spam")
    assert(got(2L)._1 === "ham")
    assert(got(1L)._2 > 0) // margin strictly positive, not a tie
    assert(!got.contains(3L))
  }

  test("planted two-distribution corpus: held-out accuracy > 0.95") {
    // documents.parquet's lang column is random METADATA (same vocab for
    // every lang — verified; the q_text_langid gate computes votes, it
    // never claims recoverability), so learnability needs a planted
    // corpus: two vocab mixtures with different skews.
    val rnd = new scala.util.Random(42)
    val vocabA = Vector("alpha", "beta", "gamma", "delta", "shared", "common")
    val vocabB = Vector("omega", "sigma", "lambda", "kappa", "shared", "common")
    def doc(v: Vector[String]) = Seq.fill(30)(v(rnd.nextInt(v.size))).mkString(" ")
    val rows = (0 until 400).map { i =>
      val a = i % 2 == 0
      (i.toLong, if (a) "A" else "B", doc(if (a) vocabA else vocabB))
    }
    val df = rows.toDF("id", "label", "text")
    val m = Classify.nbTrain(df.filter($"id" < 200), $"label", $"text")
    val held = df.filter($"id" >= 200)
    val pred = Classify.nbPredict(held, $"id", $"text", m)
    val joined = pred.join(held.select($"id", $"label"), "id")
    val n = joined.count()
    val hit = joined.filter($"label_pred" === $"label").count()
    assert(n === 200L)
    assert(hit.toDouble / n > 0.95, s"accuracy ${hit.toDouble / n} on $n docs")
  }

  test("fused zero-shuffle path matches the relational path (scores, labels, margins)") {
    val m = tinyModel
    val bm = graft.functions.Classify.broadcastModel(m)
    val docs = Seq((1L, "buy cheap now"), (2L, "dear hello friend hello"),
      (3L, "buy now pills unseen"), (4L, "shared vocab words none")).toDF("id", "text")
    val rel = Classify.nbPredict(docs, $"id", $"text", m)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2), r.getDouble(3))).toMap
    val fus = Classify.nbPredictFused(docs, $"id", $"text", bm)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(fus.keySet === rel.keySet)
    rel.foreach { case (id, (lbl, ll, mg)) =>
      assert(fus(id)._1 === lbl, s"label for $id")
      // float sums run in different orders (token order vs agg order)
      assert(math.abs(fus(id)._2 - ll) < 1e-9, s"ll for $id")
      assert(math.abs(fus(id)._3 - mg) < 1e-9, s"margin for $id")
    }
  }

  test("fused path on a planted corpus: held-out accuracy matches the relational path") {
    val rnd = new scala.util.Random(43)
    val vocabA = Vector("alpha", "beta", "gamma", "shared")
    val vocabB = Vector("omega", "sigma", "lambda", "shared")
    def doc(v: Vector[String]) = Seq.fill(20)(v(rnd.nextInt(v.size))).mkString(" ")
    val rows = (0 until 200).map { i =>
      val a = i % 2 == 0
      (i.toLong, if (a) "A" else "B", doc(if (a) vocabA else vocabB))
    }
    val df = rows.toDF("id", "label", "text")
    val m = Classify.nbTrain(df.filter($"id" < 100), $"label", $"text")
    val bm = graft.functions.Classify.broadcastModel(m)
    val held = df.filter($"id" >= 100)
    val rel = Classify.nbPredict(held, $"id", $"text", m)
      .select($"id", $"label_pred").as[(Long, String)].collect().toMap
    val fus = Classify.nbPredictFused(held, $"id", $"text", bm)
      .select($"id", $"label_pred").as[(Long, String)].collect().toMap
    assert(fus === rel)
  }

  test("fused filter is a stateless streaming operator with batch parity") {
    val m = tinyModel
    val bm = graft.functions.Classify.broadcastModel(m)
    val batch = Seq((1L, "buy cheap now"), (2L, "dear hello friend"),
      (3L, "buy buy buy")).toDF("id", "text")
    val expected = Classify.classifierFilterFused(batch, $"text", bm, "spam")
      .select($"id").as[Long].collect().toSet

    val src = graft.connectors.Testing.testingSource[(Long, String)](spark)
    src.addBatch((1L, "buy cheap now"), (2L, "dear hello friend"))
    src.addBatch((3L, "buy buy buy"))
    val filtered = Classify.classifierFilterFused(
      src.toDS().toDF("id", "text"), $"text", bm, "spam")
    assert(filtered.isStreaming, "fused filter must preserve streaming-ness")
    val got = graft.streaming.StreamingOps.runToMemory(
      filtered.select($"id"), "cls_fused_out")
      .as[Long].collect().toSet
    assert(got === expected)
    assert(expected === Set(1L, 3L))
  }

  test("fused path scores zero-token docs prior-only (documented divergence)") {
    val m = tinyModel
    val bm = graft.functions.Classify.broadcastModel(m)
    val docs = Seq((1L, "   ")).toDF("id", "text")
    val fus = Classify.nbPredictFused(docs, $"id", $"text", bm).collect()
    assert(fus.length === 1)
    // prior-only: spam prior ln(2/3) > ham prior ln(1/3)
    assert(fus(0).getString(1) === "spam")
    assert(math.abs(fus(0).getDouble(2) - math.log(2.0 / 3)) < 1e-12)
  }

  test("null edges: null-label rows ignored in training; null text scores no row on either path") {
    val train = Seq(
      (Some("spam"), "buy now"), (None, "phantom class"),
      (Some("ham"), "hello friend")).map { case (l, t) => (l.orNull, t) }
      .toDF("label", "text")
    val m = Classify.nbTrain(train, $"label", $"text")
    assert(m.classes.count() === 2L)
    val bm = Classify.broadcastModel(m) // NPE without the null guard
    assert(bm.labels.toSeq === Seq("ham", "spam"))
    val docs = Seq((1L, "buy now"), (2L, null.asInstanceOf[String])).toDF("id", "text")
    assert(Classify.nbPredict(docs, $"id", $"text", m)
      .select($"id").as[Long].collect().toSet === Set(1L))
    assert(Classify.nbPredictFused(docs, $"id", $"text", bm)
      .select($"id").as[Long].collect().toSet === Set(1L))
  }

  test("classifierFilter keeps exactly the predicted-label docs above margin") {
    val m = tinyModel
    val docs = Seq((1L, "buy cheap now"), (2L, "dear hello friend")).toDF("id", "text")
    val kept = Classify.classifierFilter(docs, $"id", $"text", m, "spam")
      .select($"id").as[Long].collect().toSet
    assert(kept === Set(1L))
    // an unsatisfiable margin keeps nothing
    val none = Classify.classifierFilter(docs, $"id", $"text", m, "spam", minMargin = 1e9)
      .count()
    assert(none === 0L)
  }
}
