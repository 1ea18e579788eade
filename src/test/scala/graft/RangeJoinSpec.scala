package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private val pts = Seq((1L, -7L), (2L, 0L), (3L, 3L), (4L, 10L), (5L, 100L))
  private val ivs = Seq(
    (10L, -10L, -5L), (11L, -2L, 4L), (12L, 3L, 3L), (13L, 9L, 30L),
    (14L, 50L, 20L)) // inverted — must be dropped, not crash

  private def got(binWidth: Long) = {
    val p = pts.toDF("pid", "x")
    val i = ivs.toDF("iid", "lo", "hi")
    RangeJoin.pointInInterval(p, "x", i, "lo", "hi", binWidth)
      .select($"pid", $"iid").as[(Long, Long)].collect().sorted.toSeq
  }

  private val want = (for {
    (pid, x) <- pts
    (iid, lo, hi) <- ivs
    if lo <= hi && x >= lo && x <= hi
  } yield (pid, iid)).sorted

  for (w <- Seq(1L, 3L, 7L, 100L))
    test(s"pointInInterval matches brute force at binWidth=$w (negatives incl.)") {
      assert(got(w) === want, s"binWidth=$w")
    }

  test("each matching pair is emitted exactly once") {
    val g = got(2L)
    assert(g.distinct.size === g.size)
  }

  test("band join |a-b| <= d matches brute force") {
    val l = Seq((1L, 0L), (2L, 7L), (3L, -4L)).toDF("lid", "a")
    val r = Seq((10L, 2L), (11L, 12L), (12L, -9L)).toDF("rid", "b")
    val g = RangeJoin.band(l, "a", r, "b", maxDist = 5L)
      .select($"lid", $"rid").as[(Long, Long)].collect().sorted.toSeq
    val w = (for {
      (lid, a) <- Seq((1L, 0L), (2L, 7L), (3L, -4L))
      (rid, b) <- Seq((10L, 2L), (11L, 12L), (12L, -9L))
      if math.abs(a - b) <= 5L
    } yield (lid, rid)).sorted
    assert(g === w)
    assert(g.map(_._1).toSet === Set(1L, 2L, 3L))
  }

  test("plan is an equi-join on the bin — no nested loop, no cartesian") {
    val p = pts.toDF("pid", "x")
    val i = ivs.toDF("iid", "lo", "hi")
    val plan = RangeJoin.pointInInterval(p, "x", i, "lo", "hi", 5L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Join") || plan.contains("join"), plan)
  }

  test("pointInIntervalAuto matches the explicit-width result (width is pure performance)") {
    val p = pts.toDF("pid", "x")
    val i = ivs.toDF("iid", "lo", "hi")
    val auto = RangeJoin.pointInIntervalAuto(p, "x", i, "lo", "hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().sorted.toSeq
    assert(auto === want)
  }

  test("self-source sides (same parent DataFrame) resolve unambiguously") {
    val ev = Seq(("c", 1L, 0L), ("c", 2L, 9L), ("p", 3L, 2L), ("p", 4L, 30L))
      .toDF("kind", "id", "t")
    val points = ev.filter($"kind" === "p").select($"id".as("p_id"), $"t".as("p_t"))
    val ivals = ev.filter($"kind" === "c")
      .select($"id".as("c_id"), ($"t" - 3L).as("lo"), ($"t" + 3L).as("hi"))
    val g = RangeJoin.pointInInterval(points, "p_t", ivals, "lo", "hi", 7L)
      .select($"p_id", $"c_id").as[(Long, Long)].collect().sorted.toSeq
    assert(g === Seq((3L, 1L)))
  }
}
