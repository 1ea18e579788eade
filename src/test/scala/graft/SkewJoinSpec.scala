package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** Salted join = plain join, row for row — the salt may only move
  * work, never change matches. Includes duplicate dim keys (each dup
  * must match once per fact row, not once per salt) and left-outer
  * null extension (unmatched fact rows survive exactly once).
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private def fact = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"), (3L, "e"), (9L, "orphan"))
    .toDF("k", "payload")
  private def dim = Seq(
    (1L, 10L), (2L, 20L), (2L, 21L), (4L, 40L)).toDF("k", "w")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select($"k", $"payload", $"w").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(t => (t._1, t._2, t._3)).toSeq

  test("inner salted join ≡ plain join, including duplicate dim keys") {
    val plain = rows(fact.join(dim, Seq("k")))
    // fact k=2 must match BOTH dim rows; k=9 drops
    assert(plain.count(_._1 == 2L) === 2)
    for (salt <- Seq(2, 16)) {
      assert(rows(SkewJoin.saltedJoin(fact, dim, Seq("k"), salt)) === plain,
        s"salt=$salt")
    }
  }

  test("left salted join ≡ plain left join (unmatched fact rows once, null-extended)") {
    val plain = rows(fact.join(dim, Seq("k"), "left"))
    assert(plain.contains((9L, "orphan", None)))
    val salted = rows(SkewJoin.saltedJoin(fact, dim, Seq("k"), 8, "left"))
    assert(salted === plain)
  }

  test("salted join is layout-stable and salt-column-free") {
    val out = SkewJoin.saltedJoin(fact.repartition(7), dim, Seq("k"), 4)
    assert(!out.columns.contains("__graft_salt"))
    assert(rows(out) === rows(fact.join(dim, Seq("k"))))
  }

  test("right/full joins and degenerate salt are rejected") {
    val e1 = intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(fact, dim, Seq("k"), 8, "right")
    }
    assert(e1.getMessage.contains("inner/left"))
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(fact, dim, Seq("k"), 8, "full_outer")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(fact, dim, Seq("k"), salt = 1)
    }
  }

  test("saltedJoinAuto derives the salt from session parallelism, same rows") {
    assert(rows(SkewJoin.saltedJoinAuto(fact, dim, Seq("k"))) ===
      rows(fact.join(dim, Seq("k"))))
  }
}
