package graft.operators

import org.apache.spark.sql._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed as-of join — for each left row, the single right row with the
  * greatest right-time <= left-time (backward), the least right-time >=
  * left-time (forward), or the minimum absolute time distance (nearest,
  * ties to backward), matched within equi-key groups. Left-outer
  * semantics: unmatched left rows keep null right columns. This is the
  * pandas `merge_asof` / DuckDB `ASOF LEFT JOIN` operation — the
  * event-to-latest-dimension-version lookup a feature/training pipeline
  * runs constantly (price as of trade time, profile as of event time).
  *
  * Spark-first design — union + running window, NOT a range join:
  * tag both inputs with a side marker, union them, and compute a
  * running `last(right_payload, ignoreNulls)` over
  * (partitionBy keys, orderBy time, side) with an unbounded-preceding
  * running frame. The plan is ONE hash exchange on the keys plus one
  * in-partition sort — identical shuffle profile to the sort-merge
  * join Spark would pick for an equi-join of the same inputs, with the
  * inequality resolved for free during the merge scan instead of by
  * candidate explosion. A naive `l.join(r, keys && lt >= rt)` +
  * groupBy-max plan materializes every (left, earlier-right) candidate
  * pair — quadratic per key in the worst case — and at 100 TB the
  * candidate shuffle, not the match, is the bottleneck. Here per-key
  * cost is exactly sort + one linear scan; the running `last` frame is
  * O(1) per row (no per-row frame rescan), and both window evaluations
  * of the nearest direction reuse the same exchange (one extra
  * in-partition sort only).
  *
  * Semantics pinned by the spec + the `q_asof_*` oracle gates:
  *  - a right row at exactly left-time matches in both directions
  *    (side marker sorts right rows before left within a timestamp);
  *  - null keys never match (right null-key rows are dropped up front;
  *    left null-key rows survive unmatched — SQL equi-join semantics);
  *  - null left times never match;
  *  - `tolerance` (compared against `leftTime - rightTime`, so pass a
  *    DayTimeInterval for timestamp axes, a number for numeric axes)
  *    nulls out matches farther than the bound, preserving the row;
  *  - right rows must be unique per (keys, time): among exact
  *    duplicates the scan keeps the last in partition order, which is
  *    nondeterministic — pre-aggregate the right side to pin it.
  *
  * At least one equi-key is required here: a keyless global as-of
  * would serialize the whole axis into one window partition. The
  * keyless case has its own operator, [[asofGlobal]] — a binned
  * two-level scan whose only single-partition work is over the BIN
  * table, never the data.
  */
object AsofJoin {

  sealed trait Direction
  case object Backward extends Direction
  case object Forward extends Direction
  case object Nearest extends Direction

  private val T = "__asof_t"
  private val SIDE = "__asof_side"
  private val L = "__asof_l"
  private val R = "__asof_r"

  /** @param keys (leftKey, rightKey) equi-key pairs; right payload
    *             column names (everything not a right key) must not
    *             collide with left column names.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftTime: String,
      rightTime: String,
      direction: Direction = Backward,
      tolerance: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty,
      "as-of join needs >=1 equi-key (keyless global as-of serializes into one partition; pre-bucket by a time bin instead)")
    val lKeys = keys.map(_._1)
    val rKeys = keys.map(_._2)
    val rPayload = right.columns.filterNot(rKeys.contains(_)).toSeq
    val collide = rPayload.intersect(left.columns.toSeq)
    require(collide.isEmpty, s"right payload collides with left columns: ${collide.mkString(", ")}")
    require(rPayload.contains(rightTime),
      s"rightTime '$rightTime' must be a non-key column of the right side")
    val tType = left.schema(leftTime).dataType

    val l2 = left.select(
      lKeys.map(col) ++ Seq(
        col(leftTime).cast(tType).as(T),
        lit(1).as(SIDE),
        struct(left.columns.toSeq.map(col): _*).as(L)): _*)
    val r2 = right
      .filter((rKeys :+ rightTime).map(col(_).isNotNull).reduce(_ && _))
      .select(
        keys.map { case (lk, rk) => col(rk).as(lk) } ++ Seq(
          col(rightTime).cast(tType).as(T),
          lit(0).as(SIDE),
          struct(rPayload.map(col): _*).as(R)): _*)
    val u = l2.unionByName(r2, allowMissingColumns = true)

    val part = Window.partitionBy(lKeys.map(col): _*)
    def running(w: expressions.WindowSpec) =
      last(col(R), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val back = running(part.orderBy(col(T).asc, col(SIDE).asc))
    val fwd = running(part.orderBy(col(T).desc_nulls_first, col(SIDE).asc))

    val matchedRaw = direction match {
      case Backward => back
      case Forward  => fwd
      case Nearest  =>
        val db = col(T) - back(rightTime)
        val df = fwd(rightTime) - col(T)
        when(back.isNull, fwd)
          .when(fwd.isNull, back)
          .when(db <= df, back)
          .otherwise(fwd)
    }
    val guarded0 = when(col(T).isNotNull, matchedRaw)
    val guarded = tolerance match {
      case None => guarded0
      case Some(tol) =>
        val dist = direction match {
          case Backward => col(T) - guarded0(rightTime)
          case Forward  => guarded0(rightTime) - col(T)
          case Nearest  => abs(col(T) - guarded0(rightTime))
        }
        when(dist <= tol, guarded0)
    }

    val leftOut = left.columns.toSeq.map(c => col(s"$L.`$c`").as(c))
    val rightOut = rPayload.map(c => col(s"__m.`$c`").as(c))
    u.withColumn("__m", guarded)
      .filter(col(SIDE) === 1)
      .select(leftOut ++ rightOut: _*)
  }

  /** KEYLESS backward as-of over a Long axis (epoch micros/millis) —
    * the global "match each event to the latest prior version"
    * lookup, without serializing the axis into one window partition.
    *
    * Binned two-level design:
    *  1. per time-bin of width `binWidth`, reduce the right side to
    *     its latest row (`max_by`) — a partial-aggregable shuffle on
    *     the bin id;
    *  2. prefix-scan those bin bests (ordered window over the BIN
    *     table — metadata-scale rows = axis span / binWidth, so the
    *     single-partition sort is over thousands of rows, not the
    *     data) to get "latest right strictly before this bin";
    *  3. each left row takes the best of its in-bin candidates with
    *     rt <= lt (bounded by per-bin density) and falls back to the
    *     carried prefix best.
    *
    * Cost: one bin-keyed candidate join bounded per bin + one
    * per-left-row aggregation — both ordinary hash shuffles; nothing
    * global touches the data rows. Right rows must be unique per
    * time (pre-aggregate) for deterministic results, as in [[asof]].
    */
  def asofGlobal(
      left: DataFrame, leftTime: String,
      right: DataFrame, rightTime: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val collide = right.columns.toSeq.intersect(left.columns.toSeq)
    require(collide.isEmpty, s"column collision across sides: ${collide.mkString(", ")}")
    val rPayload = right.columns.toSeq
    def bin(c: Column) = ((c - pmod(c, lit(binWidth))) / lit(binWidth)).cast("long")

    val r2 = right.filter(col(rightTime).isNotNull)
      .select(struct(rPayload.map(col): _*).as(R), col(rightTime).as("__rt"))
      .withColumn("__bin", bin(col("__rt")))
    // 1. latest right per bin
    val perBin = r2.groupBy(col("__bin"))
      .agg(max_by(col(R), col("__rt")).as("__best"), max(col("__rt")).as("__maxrt"))
    // 2. prefix bests over the union bin axis (covers left-only bins)
    val l2 = left.withColumn("__bin", bin(col(leftTime)))
    val axis = l2.select(col("__bin")).union(perBin.select(col("__bin"))).distinct()
    val w = Window.orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = axis.join(perBin, Seq("__bin"), "left")
      .withColumn("__carry", last(col("__best"), ignoreNulls = true).over(w))
      .select(col("__bin"), col("__carry"))
    // 3. in-bin best per left row, then fall back to the carry
    // row identity = content hash, NOT monotonically_increasing_id: l3
    // feeds two plan branches, and mid is assigned per recomputation —
    // the two branches could disagree. Identical-content left rows
    // share a group, the same candidate set, and the same match, then
    // fan back out in the final join, so cardinality is preserved.
    val lid = "__lrow"
    val l3 = l2.withColumn(lid,
      xxhash64(struct(left.columns.toSeq.map(col): _*)))
    val inBin = l3
      .join(r2, l3("__bin") === r2("__bin") && col("__rt") <= col(leftTime), "left")
      .groupBy(col(lid))
      .agg(max_by(col(R), col("__rt")).as("__inbin"))
    val leftOut = left.columns.toSeq.map(col)
    val rightOut = rPayload.map(c => col(s"__m.`$c`").as(c))
    l3.join(inBin, lid)
      .join(carry, Seq("__bin"), "left")
      .withColumn("__m", coalesce(col("__inbin"), col("__carry")))
      .select(leftOut ++ rightOut: _*)
  }

  /** [[asofGlobal]] with the bin width derived from axis statistics.
    * The width trades the in-bin candidate join (Σ_bin l_b·r_b ≈
    * L·R·w/span — shrinks with w) against the BIN-table prefix scan
    * (span/w rows through one single-partition ordered window — grows
    * as w shrinks). Holding right rows per bin at a constant
    * `targetPerBin` makes the candidate term ≈ L·targetPerBin (linear
    * in the left side, independent of R) while the bin table stays
    * R/targetPerBin rows; the bin count is additionally clamped to
    * [32, 2²⁰] so the single-partition scan never exceeds ~1M
    * metadata rows whatever the corpus (at the cap the candidate term
    * degrades gracefully to L·R/2²⁰ — still six orders below naive).
    * One tiny stats aggregation per side.
    */
  def asofGlobalAuto(
      left: DataFrame, leftTime: String,
      right: DataFrame, rightTime: String,
      targetPerBin: Int = 64): DataFrame = {
    require(targetPerBin > 0, "targetPerBin must be positive")
    val rst = right.filter(col(rightTime).isNotNull)
      .agg(count(lit(1)), min(col(rightTime)), max(col(rightTime))).head()
    val lst = left.filter(col(leftTime).isNotNull)
      .agg(min(col(leftTime)), max(col(leftTime))).head()
    require(rst.getLong(0) > 0, "asofGlobalAuto: empty right side")
    // an all-null/empty left contributes no extent (result is empty
    // anyway, but the stats pass must not NPE)
    val (lmn, lmx) =
      if (lst.isNullAt(0)) (rst.getLong(1), rst.getLong(2))
      else (lst.getLong(0), lst.getLong(1))
    val span = math.max(1L,
      math.max(rst.getLong(2), lmx) - math.min(rst.getLong(1), lmn) + 1)
    val bins = math.min(1L << 20, math.max(32L, rst.getLong(0) / targetPerBin))
    val binWidth = math.max(1L, (span + bins - 1) / bins)
    asofGlobal(left, leftTime, right, rightTime, binWidth)
  }

  private implicit class FieldOps(c: Column) {
    def apply(field: String): Column = c.getField(field)
  }
}
