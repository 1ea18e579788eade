package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.functions.{Dedup, MinHash}

/** Streaming near-duplicate detection — the on-ingest counterpart of
  * [[graft.functions.Dedup.minhashLshPairs]] (the reference has
  * streaming-native operators but no corpus dedup at all; this is
  * brief-mandated surface, so the contract mirrors the batch
  * operator's: MinHash band buckets generate candidates, exact
  * Jaccard over shingle-hash sets verifies them).
  *
  * Dataflow: doc → shingle-hash set + MinHash signature (one fused
  * codegen'd pass each) → explode into `bands` band buckets →
  * `transformWithState` keyed by the 64-bit bucket hash. Per-bucket
  * state holds the recent docs' (id, sorted shingle hashes); an
  * arriving doc is exact-verified against them (sorted-merge
  * intersection, no re-tokenization) and every pair ≥ `threshold`
  * is emitted as (i, j, jac) with i = the earlier doc.
  *
  * At-least-once pair semantics: a pair sharing k band buckets is
  * emitted up to k times (the batch operator dedups with one extra
  * shuffle; on a stream that would need a second stateful stage).
  * Downstream consumers are insensitive by construction —
  * [[graft.functions.Dedup.connectedComponents]] canonicalizes and
  * `distinct()` on a bounded sink does the rest.
  *
  * State bounds (the 100 TB story): `ttl` expires idle buckets —
  * near-dup detection only looks back `ttl` of event arrival, exactly
  * like [[Dedup.streamingExactDedup]]'s watermark horizon — and
  * `maxBucketSize` caps per-bucket membership FIFO (a degenerate
  * boilerplate bucket otherwise grows without bound AND would make
  * every arrival O(bucket); with the cap it is O(maxBucketSize) work
  * per (doc, band)). Requires the RocksDB state store provider, the
  * same requirement as every transformWithState operator here.
  */
object StreamingDedup {

  /** Per-bucket state: parallel arrays (ids, flattened sorted shingle
    * hash sets, per-doc offsets) — a flat product encodes efficiently
    * in the state store. (Not `private`: the product encoder reflects
    * over the constructor.)
    */
  final case class Bucket(ids: Array[Long], offsets: Array[Int], hashes: Array[Long])

  object Bucket {
    val empty: Bucket = Bucket(Array.empty, Array.empty, Array.empty)
  }

  /** Sorted-merge intersection count of two ascending Long arrays. */
  private def intersect(a: Array[Long], aFrom: Int, aTo: Int,
      b: Array[Long], bFrom: Int, bTo: Int): Int = {
    var i = aFrom; var j = bFrom; var n = 0
    while (i < aTo && j < bTo) {
      val c = java.lang.Long.compare(a(i), b(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  private final class BucketProcessor(threshold: Double, maxBucketSize: Int,
      ttl: Option[java.time.Duration])
    extends StatefulProcessor[Long, (Long, Long, Array[Long]), (Long, Long, Double)] {

    @transient private var state: ValueState[Bucket] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Bucket]("graft_lsh_bucket",
        Encoders.product[Bucket], ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Array[Long])],
        tv: TimerValues): Iterator[(Long, Long, Double)] = {
      var bucket = if (state.exists()) state.get() else Bucket.empty
      val out = Vector.newBuilder[(Long, Long, Double)]
      rows.foreach { case (_, id, sh) =>
        // verify the arrival against every resident of the bucket
        val nDoc = sh.length
        var d = 0
        while (d < bucket.ids.length) {
          val from = bucket.offsets(d)
          val to = if (d + 1 < bucket.offsets.length) bucket.offsets(d + 1) else bucket.hashes.length
          if (bucket.ids(d) != id) {
            val inter = intersect(bucket.hashes, from, to, sh, 0, nDoc)
            val union = (to - from) + nDoc - inter
            val jac = if (union == 0) 0.0 else inter.toDouble / union
            if (jac >= threshold) {
              val (i, j) = if (bucket.ids(d) < id) (bucket.ids(d), id) else (id, bucket.ids(d))
              out += ((i, j, jac))
            }
          }
          d += 1
        }
        // append the arrival; FIFO-evict past the cap
        val ids = bucket.ids :+ id
        val offsets = bucket.offsets :+ bucket.hashes.length
        val hashes = bucket.hashes ++ sh
        bucket =
          if (maxBucketSize > 0 && ids.length > maxBucketSize) {
            val cut = offsets(1)
            Bucket(ids.drop(1), offsets.drop(1).map(_ - cut), hashes.drop(cut))
          } else Bucket(ids, offsets, hashes)
      }
      state.update(bucket)
      out.result().iterator
    }
  }

  /** Per-bucket state for the embedding variant: resident ids and
    * flattened vectors (fixed dimension per stream).
    */
  final case class VecBucket(ids: Array[Long], dim: Int, vecs: Array[Double])

  object VecBucket {
    val empty: VecBucket = VecBucket(Array.empty, 0, Array.empty)
  }

  private final class VecBucketProcessor(threshold: Double, maxBucketSize: Int,
      ttl: Option[java.time.Duration])
    extends StatefulProcessor[Long, (Long, Long, Array[Double]), (Long, Long, Double)] {

    @transient private var state: ValueState[VecBucket] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[VecBucket]("graft_vec_bucket",
        Encoders.product[VecBucket], ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    private def cosine(a: Array[Double], aFrom: Int, b: Array[Double], dim: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) {
        val x = a(aFrom + i); val y = b(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    }

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Array[Double])],
        tv: TimerValues): Iterator[(Long, Long, Double)] = {
      var bucket = if (state.exists()) state.get() else VecBucket.empty
      val out = Vector.newBuilder[(Long, Long, Double)]
      rows.foreach { case (_, id, v) =>
        val dim = v.length
        var d = 0
        while (d < bucket.ids.length) {
          if (bucket.ids(d) != id && bucket.dim == dim) {
            val sim = cosine(bucket.vecs, d * dim, v, dim)
            if (sim >= threshold) {
              val (i, j) = if (bucket.ids(d) < id) (bucket.ids(d), id) else (id, bucket.ids(d))
              out += ((i, j, sim))
            }
          }
          d += 1
        }
        val ids = bucket.ids :+ id
        val vecs = bucket.vecs ++ v
        bucket =
          if (maxBucketSize > 0 && ids.length > maxBucketSize)
            VecBucket(ids.drop(1), dim, vecs.drop(dim))
          else VecBucket(ids, dim, vecs)
      }
      state.update(bucket)
      out.result().iterator
    }
  }

  /** Embedding-space variant — on-ingest SemDeDup candidate+verify:
    * arriving vectors land in `tables` OR-amplified random-hyperplane
    * buckets ([[graft.functions.Similarity.lshSketch]], the same
    * sketch as the batch `bucketedCosinePairsAuto`), per-bucket state
    * holds recent residents' vectors, exact cosine verifies on
    * arrival. Same at-least-once emission and TTL/FIFO state bounds
    * as [[nearDupPairs]]. Feed the emitted pairs to
    * [[graft.functions.Dedup.connectedComponents]] on the bounded
    * sink for cluster-canonical dedup.
    */
  def nearDupVectors(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int, tables: Int,
      maxBucketSize: Int = 128, ttl: Option[java.time.Duration] = None): Dataset[(Long, Long, Double)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .filter(size(col("v")) > 0)
      .select(col("id"), col("v"),
        posexplode(graft.functions.Similarity.lshSketch(col("v"), bits, tables))
          .as(Seq("t", "b")))
      // (table, bucket) → one 64-bit state key
      .select(xxhash64(col("t").cast("long"), col("b")).as("bh"), col("id"), col("v"))
      .as[(Long, Long, Array[Double])]
    prepared
      .groupByKey(_._1)
      .transformWithState(new VecBucketProcessor(threshold, maxBucketSize, ttl),
        timeModeFor(ttl), OutputMode.Append())
  }

  /** Emit near-dup pairs (i, j, jac) for documents arriving on a
    * stream. `df` must be a streaming DataFrame; `idCol` a long id,
    * `textCol` the document text. Returns a streaming Dataset of
    * (i, j, jac) — run in Append mode.
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bands: Int, threshold: Double,
      maxBucketSize: Int = 128, ttl: Option[java.time.Duration] = None): Dataset[(Long, Long, Double)] = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df
      .select(col(idCol).cast("long").as("id"),
        Dedup.shingles(col(textCol), n).as("sh0"))
      .filter(size(col("sh0")) > 0)
      // sorted distinct shingle hashes (the verify set) + signature
      .withColumn("sh", array_sort(transform(col("sh0"), s => xxhash64(s))))
      .withColumn("sig", MinHash.minhash_sig(col("sh0"), numHashes))
      .select(col("id"), col("sh"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b.cast("long"),
            xxhash64(slice(col("sig"), b * lit(rows) + lit(1), lit(rows)))))).as("bh"))
      .as[(Long, Array[Long], Long)]
      .map { case (id, sh, bh) => (bh, id, sh) }
    prepared
      .groupByKey(_._1)
      .transformWithState(new BucketProcessor(threshold, maxBucketSize, ttl),
        timeModeFor(ttl), OutputMode.Append())
  }

  /** Spark supports state TTL only under processing-time semantics;
    * without a TTL the operator runs in TimeMode.None so bounded
    * drains settle (see [[TransformWithStateOps.statefulTws]]).
    */
  private def timeModeFor(ttl: Option[java.time.Duration]): TimeMode =
    if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
}
