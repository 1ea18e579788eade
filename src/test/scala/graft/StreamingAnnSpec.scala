package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.connectors.Testing
import graft.functions.{Int8, Similarity}
import graft.streaming.StreamingAnn

class StreamingAnnSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Tables.load(spark, sf0001, "embeddings")
    .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v"))

  private def collectRows(out: org.apache.spark.sql.DataFrame,
      buf: scala.collection.mutable.ArrayBuffer[Row]): Unit =
    buf.synchronized { buf ++= out.collect() }

  test("streaming IVF serve ≡ batch serve, regardless of micro-batch split") {
    val emb = corpus.cache()
    val dir = java.nio.file.Files.createTempDirectory("sann").toString
    Similarity.ivfCentroids(emb, "id", "v", nlist = 16)
      .write.parquet(s"$dir/centroids")
    val centroids = spark.read.parquet(s"$dir/centroids")
    Similarity.ivfAssign(emb, "id", "v", centroids).write.parquet(s"$dir/cells")
    val cells = spark.read.parquet(s"$dir/cells")

    val qs = emb.limit(30).as[(Long, Seq[Double])].collect()
    val expected = Similarity.ivfQueryIndex(
      qs.toSeq.toDF("id", "v"), "id", "v", centroids, cells, nprobe = 3, k = 5)
      .collect().toSet

    val src = Testing.testingSource[(Long, Seq[Double])](spark)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingAnn.serveIvf(src.toDS().toDF("id", "v"), "id", "v",
      centroids, cells, nprobe = 3, k = 5,
      sink = (out, _) => collectRows(out, buf),
      trigger = Trigger.ProcessingTime(0))
    try {
      qs.grouped(10).foreach { batch =>
        src.addBatch(batch.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(buf.toSet === expected)
    assert(expected.nonEmpty)
    emb.unpersist()
  }

  test("streaming int8 serve ≡ batch serve over the persisted codes index") {
    val emb = corpus.cache()
    val dir = java.nio.file.Files.createTempDirectory("sann8").toString
    Int8.int8Index(emb, "id", "v", bits = 4).write.parquet(s"$dir/index")
    val index = spark.read.parquet(s"$dir/index")

    val qs = emb.limit(20).as[(Long, Seq[Double])].collect()
    val expected = Int8.int8QueryIndex(
      qs.toSeq.toDF("id", "v"), "id", "v", bits = 4, index, k = 3)
      .collect().toSet

    val src = Testing.testingSource[(Long, Seq[Double])](spark)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingAnn.serveInt8(src.toDS().toDF("id", "v"), "id", "v",
      index, bits = 4, k = 3,
      sink = (out, _) => collectRows(out, buf),
      trigger = Trigger.ProcessingTime(0))
    try {
      qs.grouped(7).foreach { batch =>
        src.addBatch(batch.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(buf.toSet === expected)
    assert(expected.nonEmpty)
    emb.unpersist()
  }

  test("streaming BM25 serve ≡ batch serve over the persisted inverted index") {
    import graft.functions.Search
    val docs = Tables.load(spark, sf0001, "documents")
    val dir = java.nio.file.Files.createTempDirectory("sbm25").toString
    Search.writeIndex(Search.buildIndex(docs, $"doc_id", $"text"), dir)
    val index = Search.readIndex(spark, dir)

    val qs = docs.limit(20)
      .select($"doc_id",
        array_join(slice(graft.functions.Text.tokens($"text"), 3, 4), " "))
      .as[(Long, String)].collect()
    val expected = Search.bm25TopK(index, qs.toSeq.toDF("qid", "qtext"),
      $"qid", $"qtext", k = 5).collect().toSet

    val src = Testing.testingSource[(Long, String)](spark)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingAnn.serveBm25(src.toDS().toDF("qid", "qtext"),
      "qid", "qtext", index, k = 5,
      sink = (out, _) => collectRows(out, buf),
      trigger = Trigger.ProcessingTime(0))
    try {
      qs.grouped(7).foreach { batch =>
        src.addBatch(batch.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(buf.toSet === expected)
    assert(expected.nonEmpty)
  }

  test("serve* rejects a non-streaming query frame") {
    val e = intercept[IllegalArgumentException] {
      StreamingAnn.serveInt8(corpus, "id", "v",
        corpus, bits = 4, k = 3, sink = (_, _) => ())
    }
    assert(e.getMessage.contains("streaming"))
  }
}
