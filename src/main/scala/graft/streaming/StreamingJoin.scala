package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time stream-stream interval join — "match each left event
  * with every right event of the same key whose time falls in
  * [lt − lower, lt + upper]" (click↔impression attribution, trade↔
  * quote windows; the keyed two-stream shape of
  * [[graft.operators.RangeJoin]]). The streaming companion to the
  * as-of join: as-of picks the NEWEST preceding right row, the
  * interval join keeps EVERY right row in the band.
  *
  * Spark-first: this is exactly Structured Streaming's native
  * stream-stream inner/outer join — a symmetric hash join over
  * watermark-bounded state — so the operator is a CONTRACT wrapper,
  * not a re-implementation: it owns the two subtleties callers get
  * wrong, (1) both sides need `withWatermark` and (2) the join
  * condition needs an explicit TIME-RANGE predicate on the two event
  * times, because that predicate is what lets the state store evict a
  * buffered row once the other side's watermark passes its band —
  * without it state grows forever (Spark would reject the outer form
  * and silently hoard state in the inner form).
  *
  * State bound: each side buffers only rows within
  * (watermark − delay − band) of the frontier ⇒ O(arrival rate ×
  * (delay + band)) per key group — the windowed-aggregation envelope.
  * Output is Append; outer-join non-matches emit once the watermark
  * proves no match can arrive (so outer results trail by delay+band).
  *
  * Contract: sides must share ONLY the key column name; event-time
  * columns are named per side and must differ (reference the batch
  * analogue [[intervalJoinBatch]] for oracle parity).
  */
object StreamingJoin {

  def intervalJoin(left: DataFrame, leftTs: String, right: DataFrame, rightTs: String,
      key: String, lower: String, upper: String, delay: String,
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, delay)
    val r = right.withWatermark(rightTs, delay)
    l.join(r, bandCondition(l, r, leftTs, rightTs, key, lower, upper), joinType)
      .drop(r(key))
  }

  /** The batch analogue with the identical predicate — the spec's
    * parity oracle and the backfill path (run the same logic over
    * history with one join, no state).
    */
  def intervalJoinBatch(left: DataFrame, leftTs: String, right: DataFrame, rightTs: String,
      key: String, lower: String, upper: String,
      joinType: String = "inner"): DataFrame =
    left.join(right,
        bandCondition(left, right, leftTs, rightTs, key, lower, upper), joinType)
      .drop(right(key))

  private def bandCondition(l: DataFrame, r: DataFrame, leftTs: String,
      rightTs: String, key: String, lower: String, upper: String): Column =
    l(key) === r(key) &&
      r(rightTs) >= l(leftTs) - expr(s"INTERVAL $lower") &&
      r(rightTs) <= l(leftTs) + expr(s"INTERVAL $upper")
}
