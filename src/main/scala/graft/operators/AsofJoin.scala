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
  * At least one equi-key is required: a keyless global as-of would
  * serialize the whole axis into one window partition. For the keyless
  * case, pre-bucket both sides on a coarse time bin (`window(ts, w)`)
  * and pass the bin as the key, duplicating each left row's candidate
  * bin and its predecessor — the binned-range-join pattern in
  * [[RangeJoin]].
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

  private implicit class FieldOps(c: Column) {
    def apply(field: String): Column = c.getField(field)
  }
}
