package graft.operators

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Binned range join — point-in-interval and band (|a-b| <= d) joins
  * between two LARGE tables with no equi-key. Spark plans a bare
  * `l.join(r, p between lo and hi)` as BroadcastNestedLoopJoin (or a
  * cartesian): O(|L|·|R|) comparisons and a broadcast of a whole
  * table — the canonical 100 TB scale-killer. Binning restores an
  * equi-key: quantize the axis into width-`binWidth` cells, key points
  * by their cell, explode each interval to the cells it overlaps, and
  * equi-join on the cell id with the exact predicate as a residual
  * filter. Work becomes O(|L| + |R|·cells_per_interval + matches) with
  * an ordinary hash shuffle on the cell id — AQE-splittable, skew-
  * saltable, the same join the optimizer already knows how to run.
  *
  * Each (point, interval) match is emitted exactly once — a point lies
  * in exactly one cell, intervals never duplicate a cell — so no
  * dedup pass is needed.
  *
  * `binWidth` is the one knob: cells_per_interval = len/binWidth + 1,
  * so pick binWidth ≈ the typical interval length (explosion factor
  * ~2) and never orders of magnitude below it. The axis is Long
  * (epoch micros for time — callers convert with `unix_micros`, which
  * keeps the arithmetic exact; doubles would round 1e15-scale epochs).
  */
object RangeJoin {

  private val BIN = "__rj_bin"

  /** Exact floor division for Long axes (negative-safe): c - pmod is
    * an exact multiple of w, and the quotient is within double's 2^53
    * exact-integer range for any epoch-scale axis and w >= 1.
    */
  private def floorDiv(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))) / lit(w)).cast("long")

  /** All (point-row, interval-row) pairs with lo <= point <= hi.
    * Output = point columns ++ interval columns (names must be
    * disjoint — also what makes post-join name resolution unambiguous
    * when both sides derive from the same source, the self-join case
    * attribute-reference Columns would trip on).
    *
    * @param point name of a Long column on `points`
    * @param lo,hi names of Long columns on `intervals` (inclusive)
    */
  def pointInInterval(
      points: DataFrame, point: String,
      intervals: DataFrame, lo: String, hi: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val collide = points.columns.toSeq.intersect(intervals.columns.toSeq)
    require(collide.isEmpty, s"column collision across sides: ${collide.mkString(", ")}")
    val p2 = points.withColumn(BIN, floorDiv(col(point), binWidth))
    val i2 = intervals
      .filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
      .withColumn(BIN,
        explode(sequence(floorDiv(col(lo), binWidth), floorDiv(col(hi), binWidth))))
    p2.join(i2, Seq(BIN))
      .filter(col(point) >= col(lo) && col(point) <= col(hi))
      .drop(BIN)
  }

  /** All (left, right) pairs with |leftVal - rightVal| <= maxDist —
    * the band join (e.g. events within ±d of each other). Sugar over
    * [[pointInInterval]] with intervals [rightVal-d, rightVal+d];
    * binWidth defaults to the band width 2d+1.
    */
  def band(
      left: DataFrame, leftVal: String,
      right: DataFrame, rightVal: String,
      maxDist: Long, binWidth: Long = 0L): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val w = if (binWidth > 0) binWidth else 2 * maxDist + 1
    val lo = s"__${rightVal}_lo"
    val hi = s"__${rightVal}_hi"
    pointInInterval(left, leftVal,
      right.withColumn(lo, col(rightVal) - maxDist)
        .withColumn(hi, col(rightVal) + maxDist),
      lo, hi, w)
      .drop(lo, hi)
  }
}
