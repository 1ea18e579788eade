package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata; decode / featurize /
  * resize run per-partition so one task touches one batch of blobs.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): [[FakeCodec]] derives deterministic pseudo-features
  * from the bytes. The Spark-side contract — schema, partition-level
  * batching, feature shapes — is real and oracle-tested.
  */
object Multimodal {

  /** Decoded-asset feature record (what a real decoder would emit). */
  case class AssetFeatures(
      asset_id: Long,
      n_bytes: Long,
      first_byte: Int,
      byte_sum: Long,
      width: Int,
      height: Int)

  /** Deterministic stand-in for an image decoder: "dimensions" derived
    * from content length, plus exact byte statistics. Replace with a
    * real codec (JNI/javax.imageio) in production — the call shape
    * (bytes → features) is unchanged.
    */
  object FakeCodec {
    def decode(id: Long, bytes: Array[Byte]): AssetFeatures = {
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
      val w = 16 + (bytes.length % 64).toInt
      AssetFeatures(id, bytes.length.toLong,
        if (bytes.isEmpty) -1 else bytes(0) & 0xff, sum, w, (w * 3) / 4)
    }
  }

  /** Featurize a (id, binary) DataFrame partition-by-partition. The
    * codec initializes once per partition (the expensive part for real
    * codecs) and streams the batch through it.
    */
  def featurize(df: DataFrame, idCol: String, blobCol: String): Dataset[AssetFeatures] = {
    val pruned = df.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
    pruned.mapPartitions { rows =>
      // real impl: val codec = Codec.open() — once per partition
      rows.map { r => FakeCodec.decode(r.getLong(0), r.getAs[Array[Byte]](1)) }
    }(Encoders.product[AssetFeatures])
  }

  /** Resized-asset record: the stub "resampler" strides through the
    * source bytes; a real resizer emits pixel data with the same call
    * shape (bytes → smaller bytes + dims).
    */
  case class ResizedAsset(
      asset_id: Long,
      in_bytes: Long,
      out_bytes: Long,
      byte_sum: Long,
      first_byte: Int,
      last_byte: Int)

  /** Downsample each blob to at most `target` bytes by striding
    * (stride = max(1, n/target)) — the resize step of an image
    * pipeline, per-partition like [[featurize]]. Deterministic byte
    * statistics stand in for pixel output so the DuckDB oracle can
    * verify the exact sampled positions.
    */
  def resize(df: DataFrame, idCol: String, blobCol: String, target: Int): Dataset[ResizedAsset] = {
    require(target >= 1)
    val pruned = df.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
    pruned.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val b = r.getAs[Array[Byte]](1)
        val n = b.length
        if (n == 0) ResizedAsset(id, 0L, 0L, 0L, -1, -1)
        else {
          val stride = math.max(1, n / target)
          val outLen = math.min(target, (n + stride - 1) / stride)
          var sum = 0L
          var i = 0
          while (i < outLen) { sum += b(i * stride) & 0xff; i += 1 }
          ResizedAsset(id, n.toLong, outLen.toLong, sum,
            b(0) & 0xff, b((outLen - 1) * stride) & 0xff)
        }
      }
    }(Encoders.product[ResizedAsset])
  }

  /** One sampled frame of a "video" blob. */
  case class Frame(asset_id: Long, frame_idx: Long, frame_bytes: Long, byte_sum: Long)

  /** Split each blob into fixed-size frames and keep every `everyNth`
    * one — the frame-sampling step of a video pipeline. flatMap shape:
    * one input row fans out to its sampled frames, so downstream
    * per-frame work (decode, embed) parallelizes across the corpus,
    * not per video.
    */
  def frameSample(df: DataFrame, idCol: String, blobCol: String,
      frameSize: Int, everyNth: Int): Dataset[Frame] = {
    require(frameSize >= 1 && everyNth >= 1)
    val pruned = df.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
    pruned.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val b = r.getAs[Array[Byte]](1)
        val n = b.length
        val nFrames = (n + frameSize - 1) / frameSize
        (0 until nFrames by everyNth).iterator.map { f =>
          val off = f * frameSize
          val len = math.min(frameSize, n - off)
          var sum = 0L
          var i = off
          while (i < off + len) { sum += b(i) & 0xff; i += 1 }
          Frame(id, f.toLong, len.toLong, sum)
        }
      }
    }(Encoders.product[Frame])
  }

  /** Byte-level difference hash (the dHash perceptual-hash family,
    * applied to the stub codec's byte stream — a real pipeline applies
    * the identical gradient construction to resized grayscale pixels):
    * stride-sample the blob to `target` bytes with the SAME stride
    * formula as [[resize]], then bit i = 1 iff sample[i+1] > sample[i]
    * (unsigned). target−1 <= 63 gradient bits pack into one long —
    * the asset near-dup signature. Fused codegen'd expression.
    */
  def dhash(blob: org.apache.spark.sql.Column, target: Int): org.apache.spark.sql.Column = {
    require(target >= 2 && target <= 64, s"target must be in [2, 64], got $target")
    org.apache.spark.sql.GraftExpr.column(DhashExpr(
      org.apache.spark.sql.GraftExpr.expression(blob), target))
  }

  /** Asset near-dup pairs: [[dhash]] signatures through the
    * generalized-pigeonhole Hamming join ([[Dedup.hammingPairs]]) —
    * dedup for image/audio corpora where text shingles don't exist.
    * Exact recall at `maxHamming` by construction; only (id, sig,
    * block-key) rows shuffle, never blobs.
    */
  def nearDupAssets(df: DataFrame, idCol: String, blobCol: String,
      target: Int = 49, maxHamming: Int = 6, blocks: Int = 0,
      groupExact: Boolean = false): DataFrame = {
    val sigs = df.select(col(idCol).cast("long").as("id"),
      dhash(col(blobCol).cast("binary"), target).as("sig"))
    // groupExact routes through the exact-sig pre-grouping — a WIN
    // only when distinct sigs << assets (re-encode-heavy corpora);
    // measured a 3.5× LOSS on a low-multiplicity corpus (SCALE.md),
    // hence opt-in rather than default
    if (groupExact)
      Dedup.hammingPairsGrouped(sigs, col("id"), col("sig"), maxHamming,
        blocks, sigBits = target - 1)
    else
      Dedup.hammingPairs(sigs, col("id"), col("sig"), maxHamming,
        blocks, sigBits = target - 1)
  }
}

/** binary → long byte-gradient dHash (see [[Multimodal.dhash]]). */
case class DhashExpr(child: org.apache.spark.sql.catalyst.expressions.Expression,
    target: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dhash requires binary, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    MultimodalImpl.dhash(input.asInstanceOf[Array[Byte]], target)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MultimodalImpl.dhash($c, $target)")

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): DhashExpr =
    copy(child = c)
}

object MultimodalImpl {
  /** Stride-sampled unsigned byte gradient bits (resize's stride
    * formula: stride = max(1, n/target), outLen = min(target,
    * ceil(n/stride))). Empty/1-byte blobs hash to 0.
    */
  def dhash(b: Array[Byte], target: Int): Long = {
    val n = b.length
    if (n == 0) return 0L
    val stride = math.max(1, n / target)
    val outLen = math.min(target, (n + stride - 1) / stride)
    var h = 0L
    var i = 0
    while (i < outLen - 1) {
      val cur = b(i * stride) & 0xff
      val nxt = b((i + 1) * stride) & 0xff
      if (nxt > cur) h |= (1L << i)
      i += 1
    }
    h
  }
}
