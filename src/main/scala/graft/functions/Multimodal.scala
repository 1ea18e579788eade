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
}
