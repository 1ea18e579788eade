package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.functions.col
import graft.functions.{Int8, Search, Similarity}

/** Streaming ANN serving: a STREAM of query vectors probing a
  * build-once/serve-many index (the persisted IVF / IVF-PQ / int8
  * relations — `Similarity.ivfQueryIndex` & co.) — the online face
  * of the serving contract: one job builds the index from the corpus,
  * this one answers queries as they arrive.
  *
  * Shape: `foreachBatch` running the EXACT batch serving operator on
  * each micro-batch's queries. This is deliberate, not a shortcut —
  * per-query top-k is an aggregation, and a global streaming
  * aggregation keyed by qid would hold every query's state forever
  * (queries don't repeat; there is nothing to watermark them by).
  * A micro-batch is a complete query set, so batch-mode top-k inside
  * the batch is exact, needs zero cross-batch state, and reuses the
  * rankers' ObjectHashAggregate scale path unchanged. The index
  * relations are static and cached once; each micro-batch is one
  * broadcast-probe join against them.
  *
  * Results parity with the batch operator is spec-pinned
  * (StreamingAnnSpec): the union of all micro-batch outputs equals
  * the batch serve of the same query set, regardless of how queries
  * were split across batches — per-query results depend only on the
  * static index, so batch boundaries are invisible.
  */
object StreamingAnn {

  /** Serve a streaming query DataFrame against a persisted float IVF
    * index. `sink` receives (result micro-batch, batchId) — write to
    * parquet/kafka/memory; batchId gives idempotent replay (the
    * FixedPartitionedSink contract).
    */
  def serveIvf(queries: DataFrame, qId: String, qVec: String,
      centroids: DataFrame, cells: DataFrame, nprobe: Int, k: Int,
      sink: (DataFrame, Long) => Unit,
      checkpoint: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    run(queries, sink, checkpoint, trigger) { batch =>
      Similarity.ivfQueryIndex(batch, qId, qVec, centroids, cells, nprobe, k)
    }

  /** Serve against a persisted int8 index (codes-only corpus side). */
  def serveInt8(queries: DataFrame, qId: String, qVec: String,
      index: DataFrame, bits: Int, k: Int,
      sink: (DataFrame, Long) => Unit,
      checkpoint: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    run(queries, sink, checkpoint, trigger) { batch =>
      Int8.int8QueryIndex(batch, qId, qVec, bits, index, k)
    }

  /** Serve against a persisted IVF-PQ index (ADC over m-byte codes). */
  def serveIvfPq(queries: DataFrame, qId: String, qVec: String,
      centroids: DataFrame, cells: DataFrame, model: graft.functions.PqModel,
      nprobe: Int, k: Int,
      sink: (DataFrame, Long) => Unit,
      checkpoint: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    run(queries, sink, checkpoint, trigger) { batch =>
      Similarity.ivfPqQueryIndex(batch, qId, qVec, centroids, cells, model, nprobe, k)
    }

  /** Serve a streaming query DataFrame against a persisted BM25
    * inverted index ([[Search.writeIndex]] relations) — the LEXICAL
    * face of the online serving contract, same foreachBatch rationale
    * as the ANN tiers (per-query top-k has nothing to watermark by; a
    * micro-batch is a complete query set). The index relations are
    * static; each micro-batch is one broadcast-terms probe join.
    */
  def serveBm25(queries: DataFrame, qId: String, qText: String,
      index: Search.SearchIndex, k: Int, k1: Double = 1.2, b: Double = 0.75,
      sink: (DataFrame, Long) => Unit = (_, _) => (),
      checkpoint: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    run(queries, sink, checkpoint, trigger) { batch =>
      Search.bm25TopK(index, batch, col(qId), col(qText), k, k1, b)
    }

  /** Hybrid online serving: BM25 ⊕ persisted-IVF cosine, RRF-fused
    * per micro-batch ([[Search.hybridTopK]]).
    */
  def serveHybrid(queries: DataFrame, qId: String, qText: String,
      qVec: String, index: Search.SearchIndex, centroids: DataFrame,
      cells: DataFrame, k: Int, nprobe: Int = 2,
      sink: (DataFrame, Long) => Unit = (_, _) => (),
      checkpoint: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    run(queries, sink, checkpoint, trigger) { batch =>
      Search.hybridTopK(index, batch, col(qId), col(qText), col(qVec),
        centroids, cells, k, nprobe = nprobe)
    }

  private def run(queries: DataFrame, sink: (DataFrame, Long) => Unit,
      checkpoint: Option[String], trigger: Trigger)(
      serve: DataFrame => DataFrame): StreamingQuery = {
    require(queries.isStreaming, "serve*: queries must be a streaming DataFrame")
    val w0 = queries.writeStream.trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val out = serve(batch.toDF())
        sink(out, batchId)
        ()
      }
    checkpoint.fold(w0)(c => w0.option("checkpointLocation", c)).start()
  }
}
