package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import graft.functions.HllImpl

/** Streaming running distinct-count per key, on the same HLL register
  * machinery as the batch [[graft.functions.Hll]] aggregates: state is
  * one 2^p-byte sketch per key, each micro-batch folds its hashes in
  * (register-wise max — idempotent, so replayed batches after recovery
  * cannot inflate the count) and emits the updated estimate. Because
  * batch and stream fold through the IDENTICAL register update, the
  * final streaming sketch is byte-identical to the batch sketch over
  * the same rows — the parity spec asserts the estimates equal
  * bit-exactly, not approximately.
  *
  * State per key is a constant 2^p bytes regardless of stream length —
  * the streaming-safe replacement for `approx_count_distinct` in
  * update-mode aggregations (and the per-key analogue of storing
  * per-shard sketches batch-side).
  */
object StreamingHll {

  /** @param ds (key, 64-bit hash) — hash upstream with
    *           [[graft.functions.Sampling.splitmix64]] / `xxhash64`
    * @return per input micro-batch and key: the updated estimate
    */
  def runningDistinct[K: Encoder](ds: Dataset[(K, Long)], p: Int)(
      implicit sEnc: Encoder[Array[Byte]],
      outEnc: Encoder[(K, Double)]): Dataset[(K, Double)] = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val logic = new TransformWithStateOps.GraftStatefulLogic[K, Long, Array[Byte], Double] {
      def onBatch(key: K, hashes: Seq[Long], state: Option[Array[Byte]])
          : (Option[Array[Byte]], Seq[Double]) = {
        val regs = state.getOrElse(new Array[Byte](1 << p))
        hashes.foreach(h => HllImpl.update(regs, h, p))
        (Some(regs), Seq(HllImpl.estimate(regs)))
      }
    }
    TransformWithStateOps.statefulTws(ds, logic)
  }
}
