package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

/** AsofJoin semantics vs a brute-force per-row scan, plus the null /
  * tie / tolerance / plan-shape contracts from the operator scaladoc.
  */
class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  // left: (id, k, lt); right: (k, rt, v)
  private def mk(left: Seq[(Long, String, java.lang.Long)],
      right: Seq[(String, Long, Double)]): (DataFrame, DataFrame) = (
    left.toDF("id", "k", "lt"),
    right.toDF("rk", "rt", "v"))

  private val left = Seq[(Long, String, java.lang.Long)](
    (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 5L), (4L, "b", 100L),
    (5L, "b", 15L), (6L, "c", 50L), (7L, null, 10L), (8L, "a", null))
  private val right = Seq(
    ("a", 10L, 1.0), ("a", 15L, 2.0), ("a", 30L, 3.0),
    ("b", 20L, 4.0), ("b", 90L, 5.0), ("d", 1L, 6.0))

  private def run(dir: AsofJoin.Direction, tol: Option[Long] = None) = {
    val (l, r) = mk(left, right)
    AsofJoin.asof(l, r, Seq("k" -> "rk"), "lt", "rt", dir, tol.map(lit(_)))
      .select($"id", $"rt", $"v").collect()
      .map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
  }

  // brute-force oracle over the same rows
  private def brute(dir: AsofJoin.Direction, tol: Option[Long]): Map[Long, Option[Long]] =
    left.map { case (id, k, lt) =>
      val cands =
        if (k == null || lt == null) Seq.empty
        else right.filter(_._1 == k).map(_._2).filter { rt =>
          dir match {
            case AsofJoin.Backward => rt <= lt && tol.forall(lt - rt <= _)
            case AsofJoin.Forward  => rt >= lt && tol.forall(rt - lt <= _)
            case AsofJoin.Nearest  => tol.forall(t => math.abs(rt - lt) <= t)
          }
        }
      val pick = dir match {
        case AsofJoin.Backward => cands.sorted.lastOption
        case AsofJoin.Forward  => cands.sorted.headOption
        case AsofJoin.Nearest  =>
          // min |distance|, ties to backward (the smaller rt)
          cands.sortBy(rt => (math.abs(rt - lt), rt)).headOption
      }
      id -> pick
    }.toMap

  for (dir <- Seq(AsofJoin.Backward, AsofJoin.Forward, AsofJoin.Nearest))
    test(s"$dir matches the brute-force oracle incl. null keys/times") {
      assert(run(dir) === brute(dir, None))
    }

  for (dir <- Seq(AsofJoin.Backward, AsofJoin.Forward, AsofJoin.Nearest))
    test(s"$dir with tolerance=4 nulls out distant matches, keeps rows") {
      val got = run(dir, Some(4L))
      assert(got === brute(dir, Some(4L)))
      assert(got.size === left.size, "tolerance must not drop left rows")
    }

  test("a right row at exactly left time matches in both directions") {
    assert(run(AsofJoin.Backward)(1L) === Some(10L))
    assert(run(AsofJoin.Forward)(1L) === Some(10L))
  }

  test("nearest tie picks the backward candidate") {
    // left lt=10 on key b? craft: key x, lt=10, right at 8 and 12 → |2| both
    val l = Seq((1L, "x", java.lang.Long.valueOf(10L))).toDF("id", "k", "lt")
    val r = Seq(("x", 8L, 1.0), ("x", 12L, 2.0)).toDF("rk", "rt", "v")
    val got = AsofJoin.asof(l, r, Seq("k" -> "rk"), "lt", "rt", AsofJoin.Nearest)
      .select($"rt").head()
    assert(got === Row(8L))
  }

  test("timestamp axis with interval tolerance") {
    val l = Seq((1L, "a", "2024-01-10 00:00:00"), (2L, "a", "2024-01-20 00:00:00"))
      .toDF("id", "k", "lts").withColumn("lt", $"lts".cast("timestamp")).drop("lts")
    val r = Seq(("a", "2024-01-09 00:00:00", 1.0), ("a", "2024-01-01 00:00:00", 2.0))
      .toDF("rk", "rts", "v").withColumn("rt", $"rts".cast("timestamp")).drop("rts")
    val got = AsofJoin.asof(l, r, Seq("k" -> "rk"), "lt", "rt",
        AsofJoin.Backward, Some(expr("INTERVAL 2 DAYS")))
      .select($"id", $"v").collect().map(x =>
        x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
    assert(got === Map(1L -> Some(1.0), 2L -> None))
  }

  test("asofGlobal (keyless) matches brute force across binWidths") {
    val lRows = Seq((1L, 10L), (2L, 3L), (3L, 64L), (4L, 200L), (5L, 1L))
    val rRows = Seq((9L, 1.0), (15L, 2.0), (63L, 3.0), (64L, 4.0), (130L, 5.0))
    val want = lRows.map { case (id, lt) =>
      id -> rRows.filter(_._1 <= lt).sortBy(_._1).lastOption.map(_._1)
    }.toMap
    for (w <- Seq(1L, 5L, 64L, 1000L)) {
      val got = AsofJoin.asofGlobal(
          lRows.toDF("id", "lt"), "lt", rRows.toDF("rt", "v"), "rt", w)
        .select($"id", $"rt").collect()
        .map(x => (x.getLong(0),
          if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
      assert(got === want, s"binWidth=$w")
    }
  }

  test("asofGlobalAuto matches the explicit-width result (width is pure performance)") {
    val lRows = Seq((1L, 10L), (2L, 3L), (3L, 64L), (4L, 200L), (5L, 1L))
    val rRows = Seq((9L, 1.0), (15L, 2.0), (63L, 3.0), (64L, 4.0), (130L, 5.0))
    def render(df: org.apache.spark.sql.DataFrame) =
      df.select($"id", $"rt").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    val explicit = render(AsofJoin.asofGlobal(
      lRows.toDF("id", "lt"), "lt", rRows.toDF("rt", "v"), "rt", 5L))
    val auto = render(AsofJoin.asofGlobalAuto(
      lRows.toDF("id", "lt"), "lt", rRows.toDF("rt", "v"), "rt"))
    assert(auto === explicit)
  }

  test("asofGlobal preserves duplicate-content left rows") {
    val l = Seq((1L, 10L), (1L, 10L), (2L, 10L)).toDF("id", "lt")
    val r = Seq((5L, 1.0)).toDF("rt", "v")
    val got = AsofJoin.asofGlobal(l, "lt", r, "rt", 4L)
      .select($"id", $"rt").as[(Long, Long)].collect().sorted.toSeq
    assert(got === Seq((1L, 5L), (1L, 5L), (2L, 5L)))
  }

  test("plan: one hash exchange on the keys, no join node, no cartesian") {
    val (l, r) = mk(left, right)
    val p = AsofJoin.asof(l, r, Seq("k" -> "rk"), "lt", "rt", AsofJoin.Nearest)
      .queryExecution.executedPlan.toString
    val exchanges = p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(exchanges === 1, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
