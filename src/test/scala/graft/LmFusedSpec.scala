package graft

import org.apache.spark.sql.functions._
import graft.functions.{LmFused, Text}

class LmFusedSpec extends SparkSpec {
  import spark.implicits._

  test("fused LM scoring matches the relational lmScore on real docs") {
    val docs = Tables.load(spark, sf0001, "documents")
    val model = Text.lmTrain(docs.filter($"doc_id" % 2 === 0), $"text")
    val bm = LmFused.broadcastModel(model)
    val rel = Text.lmScore(docs, $"doc_id", $"text", model)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val fus = LmFused.lmScoreFused(docs, $"doc_id", $"text", bm)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(fus.keySet === rel.keySet)
    assert(rel.nonEmpty)
    rel.foreach { case (id, (ns, nb, ll, ppl)) =>
      assert(fus(id)._1 === ns, s"n_scored for $id")
      assert(fus(id)._2 === nb, s"n_backoff for $id")
      assert(math.abs(fus(id)._3 - ll) < 1e-9 * math.max(1.0, math.abs(ll)), s"ll for $id")
      assert(math.abs(fus(id)._4 - ppl) < 1e-9 * math.max(1.0, ppl), s"ppl for $id")
    }
    // the backoff path must actually fire on odd docs for the parity
    // to mean anything
    assert(rel.values.exists(_._2 > 0), "no backoff positions exercised")
  }

  test("perplexityFilter is a stateless streaming operator with batch parity") {
    val docs = Tables.load(spark, sf0001, "documents").limit(50)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val model = Text.lmTrain(
      docs.toSeq.toDF("doc_id", "text").filter($"doc_id" % 2 === 0), $"text")
    val bm = LmFused.broadcastModel(model)
    // threshold at the median ppl so the filter is differentially live
    val ppls = LmFused.lmScoreFused(docs.toSeq.toDF("doc_id", "text"),
      $"doc_id", $"text", bm).select($"ppl").as[Double].collect().sorted
    val thr = ppls(ppls.length / 2)
    val batchKeep = LmFused.perplexityFilter(
      docs.toSeq.toDF("doc_id", "text"), $"text", bm, thr)
      .select($"doc_id").as[Long].collect().toSet
    assert(batchKeep.nonEmpty && batchKeep.size < docs.length)

    val src = graft.connectors.Testing.testingSource[(Long, String)](spark)
    docs.grouped(20).foreach(b => src.addBatch(b.toSeq: _*))
    val filtered = LmFused.perplexityFilter(
      src.toDS().toDF("doc_id", "text"), $"text", bm, thr)
    assert(filtered.isStreaming)
    val got = graft.streaming.StreamingOps.runToMemory(
      filtered.select($"doc_id"), "lm_fused_out").as[Long].collect().toSet
    assert(got === batchKeep)
  }

  test("docs under 2 tokens: no scored row, but the filter keeps them") {
    val model = Text.lmTrain(Seq("the cat sat").toDF("text"), $"text")
    val bm = LmFused.broadcastModel(model)
    val docs = Seq((1L, "single"), (2L, ""), (3L, "the cat"),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val scored = LmFused.lmScoreFused(docs, $"id", $"text", bm)
      .select($"id").as[Long].collect().toSet
    assert(scored === Set(3L))
    val kept = LmFused.perplexityFilter(docs, $"text", bm, maxPpl = 1e18)
      .select($"id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L, 4L)) // null text = unscorable = kept
  }
}
