package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.{Hist, Profile, Validate}

/** Streaming faces of the data-quality family: per-micro-batch
  * constraint reports ([[Validate]]) and online distribution-drift
  * monitoring ([[Profile.psi]] against a FROZEN reference histogram).
  *
  * Both run the EXACT batch operator per micro-batch via foreachBatch
  * (the [[StreamingAnn]] rationale): a constraint report and a PSI
  * reading are complete statements about a batch of arrivals — a
  * global streaming aggregation keyed by check/column would hold
  * all-time state with nothing to watermark by, and all-time totals
  * are one trivial sum over the persisted per-batch reports anyway.
  * The reference-histogram contract mirrors the frozen-centroid one:
  * drift is measured against the distribution you trained/validated
  * on, not against a moving self-reference that would absorb the very
  * shift being monitored.
  */
object StreamingQuality {

  /** Run the constraint suite on every micro-batch and hand the report
    * (with a `batch_id` column) to `onReport` — sink it, alert on it,
    * or both. Validation is per-batch by design: a bad DROP of
    * documents should fail ITS batch's gate loudly, not dissolve into
    * an all-time average.
    */
  def validateStream(df: DataFrame, checks: Seq[Validate.Check],
      onReport: (DataFrame, Long) => Unit,
      checkpoint: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(df.isStreaming, "validateStream: df must be a streaming DataFrame")
    val w0 = df.writeStream.trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        onReport(
          Validate.report(batch.toDF(), checks).withColumn("batch_id", lit(batchId)),
          batchId)
        ()
      }
    checkpoint.fold(w0)(c => w0.option("checkpointLocation", c)).start()
  }

  /** Online drift monitor: per micro-batch, histogram `valueCol` on
    * the reference grid and emit `(batch_id, n, psi)` against the
    * frozen `refHist` (a `[lo, hi, nbins]` [[Hist.histSketch]] row —
    * build it once from the reference corpus, persist it beside the
    * model). The per-batch sketch is one fixed-size aggregate; the
    * PSI is 1-row arithmetic — nothing about the monitor grows with
    * the stream.
    */
  def driftMonitor(df: DataFrame, valueCol: String, refHist: Array[Long],
      lo: Double, hi: Double, nbins: Int,
      onReading: (Long, Long, Double) => Unit,
      checkpoint: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(df.isStreaming, "driftMonitor: df must be a streaming DataFrame")
    require(refHist.length == nbins + 2,
      s"driftMonitor: refHist has ${refHist.length} slots, grid needs ${nbins + 2}")
    val w0 = df.writeStream.trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val row = batch.toDF()
          .agg(count(lit(1)).as("n"),
            Hist.histSketch(col(valueCol), lo, hi, nbins).as("h"))
          .select(col("n"),
            Profile.psi(typedLit(refHist.toSeq), col("h")).as("psi"))
          .head()
        onReading(batchId, row.getLong(0), row.getDouble(1))
        ()
      }
    checkpoint.fold(w0)(c => w0.option("checkpointLocation", c)).start()
  }

  /** Streaming novelty scoring: every micro-batch of documents scores
    * against a FROZEN [[graft.functions.Dedup.NoveltyRef]] (built once
    * from the reference corpus with `writeNoveltyRef`) — the exact
    * batch operator per batch, like every serving face here. Being
    * reference-frozen, the monitor flags arriving content the
    * benchmark suite already contains BEFORE it lands in a training
    * shard.
    */
  def noveltyMonitor(docs: DataFrame, idCol: String, textCol: String,
      ref: graft.functions.Dedup.NoveltyRef,
      onBatch: (DataFrame, Long) => Unit,
      checkpoint: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(docs.isStreaming, "noveltyMonitor: docs must be a streaming DataFrame")
    val w0 = docs.writeStream.trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        onBatch(
          graft.functions.Dedup.noveltyStatsServe(batch.toDF(),
            col(idCol), col(textCol), ref),
          batchId)
        ()
      }
    checkpoint.fold(w0)(c => w0.option("checkpointLocation", c)).start()
  }

  /** Online outlier flagging against FROZEN robust statistics: build
    * per-group (median, MAD) once from a reference window with
    * [[referenceRobustStats]], then flag each arriving row whose
    * micro-unit deviation from its group's frozen median exceeds
    * k·MAD — the [[graft.functions.Events.anomalies]] contract with
    * the stats side frozen (a self-referenced MAD would absorb the
    * very level shift being monitored, the driftMonitor rationale).
    * `onBatch` receives the rows with `med`/`mad`/`is_anomaly`
    * appended; rows in groups absent from the reference never flag.
    * The stats ride the closure as a small map — one row per group,
    * the bounded-model-fit shape.
    */
  def anomalyMonitor(df: DataFrame, groupCol: String, valueCol: String,
      stats: Map[String, (Long, Long)], k: Long, unitScale: Long = 1L,
      onBatch: (DataFrame, Long) => Unit,
      checkpoint: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(df.isStreaming, "anomalyMonitor: df must be a streaming DataFrame")
    require(k > 0 && unitScale > 0, "k and unitScale must be positive")
    val spark = df.sparkSession
    val w0 = df.writeStream.trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        import spark.implicits._
        val statsDf = stats.toSeq.map { case (g, (med, mad)) => (g, med, mad) }
          .toDF(groupCol, "med", "mad")
        val u =
          if (unitScale == 1L) col(valueCol).cast("long")
          else round(col(valueCol) * lit(unitScale)).cast("long")
        onBatch(batch.toDF().join(broadcast(statsDf), Seq(groupCol), "left")
          .withColumn("is_anomaly",
            coalesce(abs(u - col("med")) > lit(k) * col("mad"), lit(false)))
          .withColumn("batch_id", lit(batchId)), batchId)
        ()
      }
    checkpoint.fold(w0)(c => w0.option("checkpointLocation", c)).start()
  }

  /** Frozen per-group robust stats from a reference window — the
    * driver-side map [[anomalyMonitor]] broadcasts via its closure
    * (one (median, MAD) pair per group: a bounded model fit).
    */
  def referenceRobustStats(ref: DataFrame, groupCol: String,
      valueCol: String, unitScale: Long = 1L): Map[String, (Long, Long)] =
    graft.functions.Events.robustStats(ref, groupCol, valueCol, unitScale)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap

  /** Build the frozen reference histogram from the reference corpus —
    * the driver-side `Array[Long]` `driftMonitor` broadcasts via its
    * closure (nbins+2 longs: a bounded model fit, the √N-centroid
    * precedent).
    */
  def referenceHist(ref: DataFrame, valueCol: String,
      lo: Double, hi: Double, nbins: Int): Array[Long] =
    ref.agg(Hist.histSketch(col(valueCol), lo, hi, nbins).as("h"))
      .head().getSeq[Long](0).toArray
}
