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

  /** [[pointInInterval]] with `binWidth` derived from axis statistics
    * — the house rule that every performance knob ships a measured
    * auto. Under a uniform-density model the two costs that move with
    * the width w are the per-cell cross scan, Σ_cell pts·ivls ≈
    * P·I·(len+w)/span (α per candidate, in-codegen cheap), and the
    * interval explosion, I·(len/w + 1) exploded-row shuffles (β per
    * row, exchange-priced); minimizing α·cross + β·explosion gives
    *
    *   w* = sqrt(κ · len_med · span / P),   κ = β/α.
    *
    * The width SHRINKS with point density (√P) — exactly the regime
    * the fixed "binWidth ≈ interval length" rule-of-thumb loses: on
    * the sf10 densified axis (2M points packed into the same 30 days)
    * 1 h bins beat the 12 h interval-length default 828 s vs 1293 s
    * (SCALE.md). κ is measured from a width sweep on the organic and
    * densified axes (tools/AsofScale) — see the scaladoc constant.
    * Clamped to [len_med/256, span]: never more than ~257 cells per
    * interval, never more than the axis.
    *
    * Three stat lookups, one tiny aggregation per side (count/median/
    * extent — parquet-footer-cheap next to the join).
    */
  def pointInIntervalAuto(
      points: DataFrame, point: String,
      intervals: DataFrame, lo: String, hi: String,
      kappa: Double = Kappa): DataFrame = {
    val ist = intervals
      .filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
      .agg(percentile_approx(col(hi) - col(lo) + 1L, lit(0.5), lit(10000)).as("len"),
        min(col(lo)).as("mn"), max(col(hi)).as("mx"))
      .head()
    require(!ist.isNullAt(0), "pointInIntervalAuto: no valid intervals")
    val pst = points.filter(col(point).isNotNull)
      .agg(count(lit(1)).as("n"), min(col(point)).as("mn"), max(col(point)).as("mx"))
      .head()
    val lenMed = math.max(1L, ist.getLong(0))
    val p = math.max(1L, pst.getLong(0))
    val span = math.max(1L,
      math.max(ist.getLong(2), pst.getLong(2)) - math.min(ist.getLong(1), pst.getLong(1)) + 1)
    val w = math.sqrt(kappa * lenMed.toDouble * span.toDouble / p.toDouble)
    val binWidth = math.max(math.max(1L, lenMed / 256), math.min(span, math.round(w)))
    pointInInterval(points, point, intervals, lo, hi, binWidth)
  }

  /** κ = β/α: the exchange cost of one exploded interval row over the
    * in-codegen cost of one candidate comparison. Calibrated by width
    * sweep (tools/AsofScale SPARK_GRAFT_BIN_SWEEP, local[32]): on the
    * sf1-DENSIFIED axis (200k pts / 200k 12h-intervals in 30 days)
    * the sweep reads 5m 5.7s / 30m 8.3s / 2h 6.4s / 12h 9.9-10.8s and
    * the auto (κ=16 → ~50min) lands 6.9-7.0s — within 1.2× of the
    * best sweep point INCLUDING its own ~0.5s stats pass, vs 1.5× for
    * the "binWidth ≈ interval length" rule it replaces. On the sf0.1
    * ORGANIC axis every width is sub-second (overhead-dominated);
    * the stats pass is the only auto cost and it amortizes with
    * scale. See SCALE.md.
    */
  val Kappa = 16.0

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
