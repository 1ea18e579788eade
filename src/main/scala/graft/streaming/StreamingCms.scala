package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import graft.functions.CmsImpl

/** Streaming running frequency estimates per key, on the same
  * Count-Min counter machinery as the batch [[graft.functions.Cms]]
  * aggregates: state is one (8 + 8*d*w)-byte sketch per key, each
  * micro-batch folds its item hashes in and emits the updated
  * estimate for every distinct item that arrived. Batch and stream
  * fold through the IDENTICAL counter update, so the final streaming
  * sketch is byte-identical to the batch sketch over the same rows —
  * the parity spec asserts estimates equal bit-exactly.
  *
  * Unlike [[StreamingHll]], counter sums are NOT idempotent — a
  * re-applied batch would double-count. Correctness under restart
  * rests on the transformWithState checkpoint contract (state commits
  * atomically with the micro-batch; recovery re-applies only
  * uncommitted batches), the same effectively-once guarantee every
  * non-idempotent stateful operator here relies on, rather than on
  * replay-safe state algebra.
  *
  * State per key is constant in stream length — the streaming-safe
  * "how often has THIS item been seen on THIS key" primitive
  * (per-tenant token counters, per-source URL frequencies) where an
  * exact per-(key, item) map would grow without bound.
  */
object StreamingCms {

  /** @param ds (key, 64-bit item hash) — hash upstream with
    *           [[graft.functions.SimHash.fnv1a64]] / `xxhash64`
    * @return per micro-batch, key, and distinct arrived item hash:
    *         (key, (item hash, updated estimate))
    */
  def runningCount[K: Encoder](ds: Dataset[(K, Long)], depth: Int, width: Int)(
      implicit sEnc: Encoder[Array[Byte]],
      outEnc: Encoder[(K, (Long, Long))]): Dataset[(K, (Long, Long))] = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    val logic = new TransformWithStateOps.GraftStatefulLogic[K, Long, Array[Byte], (Long, Long)] {
      def onBatch(key: K, hashes: Seq[Long], state: Option[Array[Byte]])
          : (Option[Array[Byte]], Seq[(Long, Long)]) = {
        val sk = state.getOrElse(CmsImpl.create(depth, width))
        hashes.foreach(h => CmsImpl.update(sk, h, 1L))
        val out = hashes.distinct.map(h => (h, CmsImpl.estimate(sk, h)))
        (Some(sk), out)
      }
    }
    TransformWithStateOps.statefulTws(ds, logic)
  }
}
