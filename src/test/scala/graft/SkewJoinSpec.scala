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

  test("bloomReduceJoin ≡ plain join even with a collision-heavy filter") {
    import graft.operators.BloomJoin
    // probe 0..999, build = multiples of 7; expectedKeys=2 deliberately
    // undersizes the filter so false positives are guaranteed — the
    // exact join must still kill every one of them
    val probe = spark.range(1000L).select($"id".as("k"),
      ($"id" * 3L).as("payload"))
    val build = spark.range(143L).select(($"id" * 7L).as("k"),
      ($"id" % 5L).as("w"))
    val plain = probe.join(build, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    for (ek <- Seq(Some(2L), None)) {
      val got = BloomJoin.bloomReduceJoin(probe, build, Seq("k"),
          expectedKeys = ek).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(got === plain, s"expectedKeys=$ek")
    }
  }

  test("reduceByBloom: no false negatives; the prefilter actually drops rows") {
    import graft.operators.BloomJoin
    val probe = spark.range(10000L).select($"id".as("k"))
    val build = spark.range(100L).select(($"id" * 97L).as("k"))
    val kept = BloomJoin.reduceByBloom(probe, build, Seq("k"))
      .collect().map(_.getLong(0)).toSet
    val trueKeys = build.collect().map(_.getLong(0)).filter(_ < 10000L).toSet
    assert(trueKeys.subsetOf(kept), "a bloom filter must never drop a match")
    // at 1% fpp over 10k probes the reduction must be near-total
    assert(kept.size < 1000, s"prefilter kept ${kept.size} of 10000")
  }

  test("bloomReduceJoin: left_semi supported, outer types rejected") {
    import graft.operators.BloomJoin
    val probe = Seq((1L, "a"), (2L, "b"), (9L, "x")).toDF("k", "p")
    val build = Seq((1L, 1L), (1L, 2L), (2L, 3L)).toDF("k", "w")
    val semi = BloomJoin.bloomReduceJoin(probe, build, Seq("k"), "left_semi")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(semi === Seq(1L, 2L)) // semi: once per probe row, no dup from build
    val e = intercept[IllegalArgumentException] {
      BloomJoin.bloomReduceJoin(probe, build, Seq("k"), "left")
    }
    assert(e.getMessage.contains("inner/left_semi"))
  }
}
