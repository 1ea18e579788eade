package graft

import org.apache.spark.sql.functions._
import graft.operators.{JoinOps, Ops, StatefulOps}

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    // key, ord, value
    ("a", 1L, 10.0), ("a", 2L, 5.0), ("b", 1L, 1.0), ("a", 3L, 2.5), ("b", 5L, 4.0)
  ).toDF("key", "ord", "value")

  test("statefulBatch folds per key in order and fires on_eof") {
    val out = StatefulOps.statefulBatch[Long, (String, Long, Long)](
      events, "key", Seq(col("ord")),
      init = _ => 0L,
      onItem = (n, r) => (n + 1, Iterator.single((r.getString(0), r.getLong(1), n))),
      onEof = (k, n) => Iterator.single((k, -1L, n)))
      .collect().toSet
    assert(out === Set(
      ("a", 1L, 0L), ("a", 2L, 1L), ("a", 3L, 2L), ("a", -1L, 3L),
      ("b", 1L, 0L), ("b", 5L, 1L), ("b", -1L, 2L)))
  }

  test("statefulMap running sum is order-deterministic") {
    val out = StatefulOps.statefulMap[Double, (String, Long, Double)](
      events, "key", Seq(col("ord")),
      init = _ => 0.0) { (s, r) =>
      val s2 = s + r.getDouble(2)
      (s2, (r.getString(0), r.getLong(1), s2))
    }.collect().toSet
    assert(out === Set(
      ("a", 1L, 10.0), ("a", 2L, 15.0), ("a", 3L, 17.5),
      ("b", 1L, 1.0), ("b", 5L, 5.0)))
  }

  test("joinComplete emits on completion then clears state") {
    // key k: a@1, a@2 (overwrites, insert=last), b@3 -> emit (a2,b3), clear;
    // then b@4 alone never completes again.
    val sideA = Seq(("k", 1L, "a1"), ("k", 2L, "a2")).toDF("key", "ord", "va")
    val sideB = Seq(("k", 3L, "b3"), ("k", 4L, "b4")).toDF("key", "ord", "vb")
    val out = JoinOps.joinComplete(spark, "key", "ord", JoinOps.InsertLast,
      JoinOps.Side(sideA, "va"), JoinOps.Side(sideB, "vb"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    assert(out === Set(("k", 3L, "a2", "b3")))
  }

  test("joinRunning emits on every arrival with null fills") {
    val sideA = Seq(("k", 1L, "a1")).toDF("key", "ord", "va")
    val sideB = Seq(("k", 2L, "b2"), ("k", 3L, "b3")).toDF("key", "ord", "vb")
    val out = JoinOps.joinRunning(spark, "key", "ord", JoinOps.InsertLast,
      JoinOps.Side(sideA, "va"), JoinOps.Side(sideB, "vb"))
      .collect().map(r => (r.getLong(1), Option(r.getString(2)), Option(r.getString(3)))).toSet
    assert(out === Set(
      (1L, Some("a1"), None),
      (2L, Some("a1"), Some("b2")),
      (3L, Some("a1"), Some("b3"))))
  }

  test("joinFinal insert=first keeps earliest per side") {
    val sideA = Seq(("k", 2L, "late"), ("k", 1L, "early")).toDF("key", "ord", "va")
    val sideB = Seq(("x", 9L, "only-b")).toDF("key", "ord", "vb")
    val rows = JoinOps.joinFinal("key", JoinOps.InsertFirst, "ord",
      JoinOps.Side(sideA, "va"), JoinOps.Side(sideB, "vb"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)), Option(r.getString(2)))).toSet
    assert(rows === Set(
      ("k", Some("early"), None),
      ("x", None, Some("only-b"))))
  }

  test("branch partitions on predicate with null-safe negation") {
    val df = Seq(Some(1), Some(5), None).toDF("v")
    val (t, f) = Ops.branch(df, col("v") > 2)
    assert(t.count() === 1 && f.count() === 2) // null lands in falses
  }
}
