package graft

import org.apache.spark.sql.functions._
import graft.functions.{Hist, Profile}

/** Column profiling + drift: exact stats on planted data, one-scan
  * plan, HLL-vs-exact distinct envelope, drift deltas, and the PSI
  * closed form (identical → 0, disjoint → large, hand-pinned value).
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def planted = Seq(
    (1L, Option(2.0), Option("a")),
    (2L, Option(4.0), Option("b")),
    (3L, Option.empty[Double], Option("a")),
    (3L, Option(10.0), Option.empty[String])
  ).toDF("id", "v", "s")

  test("profile: exact face — counts, nulls, distinct, decimal-rendered endpoints") {
    val p = Profile.profile(planted, Seq("id", "v", "s"), exactDistinct = true)
      .collect().map(r => r.getString(0) -> r).toMap
    val id = p("id")
    assert(id.getString(1) === "bigint")
    assert(id.getLong(2) === 4L && id.getLong(3) === 0L && id.getLong(4) === 3L)
    assert(id.getDouble(5) === 1.0 && id.getDouble(6) === 3.0 && id.getDouble(7) === 9.0)
    val v = p("v")
    assert(v.getString(1) === "double")
    assert(v.getLong(3) === 1L && v.getLong(4) === 3L)
    assert(v.getDouble(5) === 2.0 && v.getDouble(6) === 10.0 && v.getDouble(7) === 16.0)
    val s = p("s")
    assert(s.getString(1) === "string")
    assert(s.getLong(3) === 1L && s.getLong(4) === 2L)
    assert(s.isNullAt(5) && s.isNullAt(6) && s.isNullAt(7))
  }

  test("profile is ONE scan; approx distinct lands within the HLL envelope") {
    val docs = Tables.load(spark, sf001, "documents")
    val exact = Profile.profile(docs, Seq("doc_id", "lang"), exactDistinct = true)
    val approx = Profile.profile(docs, Seq("doc_id", "lang"))
    assert(approx.queryExecution.executedPlan.collectLeaves().length === 1)
    val e = exact.select($"col_name", $"n_distinct").as[(String, Long)].collect().toMap
    val a = approx.select($"col_name", $"n_distinct").as[(String, Long)].collect().toMap
    e.foreach { case (c, n) =>
      assert(math.abs(a(c) - n).toDouble / n < 0.1, s"$c: exact=$n approx=${a(c)}")
    }
  }

  test("profileBy: per-stratum cards in one grouped scan; profile ≡ single-stratum case") {
    val df = Seq(
      ("a", 1L, Option(2.0)), ("a", 2L, Option.empty[Double]),
      ("b", 3L, Option(9.0))).toDF("src", "id", "v")
    val by = Profile.profileBy(df, $"src", Seq("id", "v"), exactDistinct = true)
    assert(by.queryExecution.executedPlan.collectLeaves().length === 1)
    val rows = by.collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val av = rows(("a", "v"))
    assert(av.getLong(3) === 2L && av.getLong(4) === 1L && av.getLong(5) === 1L)
    assert(av.getDouble(6) === 2.0 && av.getDouble(8) === 2.0)
    val bid = rows(("b", "id"))
    assert(bid.getLong(3) === 1L && bid.getDouble(6) === 3.0 && bid.getDouble(7) === 3.0)
    // profile is exactly the single-stratum projection of the same machinery
    val flat = Profile.profile(df, Seq("id", "v"), exactDistinct = true)
    assert(flat.columns.toSeq ===
      Seq("col_name", "dtype", "n", "nulls", "n_distinct", "min_v", "max_v", "sum_v"))
    assert(flat.filter($"col_name" === "id").select($"n").as[Long].head() === 3L)
  }

  test("drift: null-frac delta, distinct ratio, range shifts, added/dropped columns") {
    val a = Profile.profile(planted, Seq("id", "v"), exactDistinct = true)
    val b = Profile.profile(
      Seq((5L, Option(20.0)), (6L, Option.empty[Double])).toDF("id", "v")
        .withColumn("extra", lit(1L)),
      Seq("id", "v", "extra"), exactDistinct = true)
    val d = Profile.drift(a, b).collect().map(r => r.getString(0) -> r).toMap
    val v = d("v")
    // null frac 1/4 → 1/2: delta 0.25; distinct 3 → 1: ratio 1/3
    assert(math.abs(v.getDouble(1) - 0.25) < 1e-12)
    assert(math.abs(v.getDouble(2) - 1.0 / 3.0) < 1e-12)
    assert(v.getDouble(3) === 18.0 && v.getDouble(4) === 10.0) // min 2→20, max 10→20
    assert(d("extra").getBoolean(5)) // added
    assert(!d("id").getBoolean(6))
  }

  test("mergeable profiles: shard roll-up ≡ direct on exact stats; sketch bit-parity; HLL envelope") {
    val docs = Tables.load(spark, sf001, "documents")
    val shards = (0 until 4).map(i =>
      Profile.profileShard(docs.filter($"doc_id" % 4 === i),
        Seq("doc_id", "n_chars", "lang")))
    val merged = Profile.mergeProfiles(shards.reduce(_.unionByName(_)))
      .collect().map(r => r.getString(0) -> r).toMap
    val direct = Profile.profile(docs, Seq("doc_id", "n_chars", "lang"),
        exactDistinct = true)
      .collect().map(r => r.getString(0) -> r).toMap
    for (c <- Seq("doc_id", "n_chars", "lang")) {
      val m = merged(c); val d = direct(c)
      assert(m.getLong(2) === d.getLong(2), s"$c n")       // counts exact
      assert(m.getLong(3) === d.getLong(3), s"$c nulls")
      if (c != "lang") {
        assert(m.getDouble(5) === d.getDouble(5), s"$c min") // endpoints exact
        assert(m.getDouble(6) === d.getDouble(6), s"$c max")
        assert(m.getDouble(7) === d.getDouble(7), s"$c sum") // decimal-carried sum exact
      }
      // HLL estimate within envelope of the exact distinct
      val exact = d.getLong(4).toDouble
      assert(math.abs(m.getLong(4) - exact) / exact < 0.1, s"$c distinct")
    }
    // merged sketch ≡ the sketch of profiling everything at once (register-max algebra)
    val direct1 = Profile.profileShard(docs, Seq("doc_id"))
      .select($"distinct_sketch").as[Array[Byte]].head()
    val merged1 = shards.reduce(_.unionByName(_))
      .filter($"col_name" === "doc_id")
      .agg(graft.functions.Hll.hllMerge($"distinct_sketch"))
      .as[Array[Byte]].head()
    assert(java.util.Arrays.equals(direct1, merged1))
    // null guard: nulls never enter the distinct sketch
    val withNulls = Seq(Option("x"), Option("x"), Option.empty[String]).toDF("v")
    val est = Profile.mergeProfiles(Profile.profileShard(withNulls, Seq("v")))
      .select($"n_distinct").as[Long].head()
    assert(est === 1L)
  }

  test("fingerprint: order/layout invariant, change-sensitive, null-safe, shard-additive") {
    val docs = Tables.load(spark, sf001, "documents")
    def fp(df: org.apache.spark.sql.DataFrame): (Long, BigInt) = {
      val r = graft.functions.Profile
        .fingerprint(df, Seq("doc_id", "text")).head()
      (r.getLong(0), BigInt(r.getString(1)))
    }
    val a = fp(docs)
    assert(a === fp(docs.repartition(17)))                    // layout-invariant
    assert(a === fp(docs.orderBy($"text")))                   // order-invariant
    val mutated = docs.withColumn("text",
      when($"doc_id" === 0L, concat($"text", lit("!"))).otherwise($"text"))
    assert(a !== fp(mutated))                                 // change-sensitive
    assert(a !== fp(docs.filter($"doc_id" =!= 0L)))           // drop-sensitive
    // shard-additive: fp(a ⊎ b) = fp(a) + fp(b)
    val l = fp(docs.filter($"doc_id" % 2 === 0))
    val r = fp(docs.filter($"doc_id" % 2 =!= 0))
    assert(l._1 + r._1 === a._1 && l._2 + r._2 === a._2)
    // null disambiguation: (null, "x") and ("x", null) differ
    import spark.implicits._
    val p = Seq((Option.empty[String], Option("x"))).toDF("a", "b")
    val q = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
    assert(graft.functions.Profile.fingerprint(p, Seq("a", "b")).head().getString(1) !==
      graft.functions.Profile.fingerprint(q, Seq("a", "b")).head().getString(1))
  }

  test("psi: 0 on identical histograms, hand-pinned value on a shift, large when disjoint") {
    def hist(vs: Seq[Double]) = vs.toDF("x")
      .agg(Hist.histSketch($"x", 0.0, 10.0, 2).as("h"))
    def psiOf(a: Seq[Double], b: Seq[Double]): Double =
      hist(a).crossJoin(hist(b).withColumnRenamed("h", "hb"))
        .select(Profile.psi($"h", $"hb")).as[Double].head()
    assert(psiOf(Seq(1, 2, 7, 8), Seq(1, 2, 7, 8)) === 0.0)
    // a: 3 low 1 high; b: 1 low 3 high → psi = 2 · 0.5·ln(3) (symmetric terms)
    val got = psiOf(Seq(1, 1, 1, 7), Seq(1, 7, 7, 7))
    assert(math.abs(got - 2 * 0.5 * math.log(3.0)) < 1e-12, s"got $got")
    // fully disjoint mass is a big number (smoothed, not infinite)
    val dj = psiOf(Seq(1, 1, 1, 1), Seq(7, 7, 7, 7))
    assert(dj > 2.0 && java.lang.Double.isFinite(dj))
    // psiBetween wires the same arithmetic end-to-end
    val pb = Profile.psiBetween(Seq(1.0, 1.0, 1.0, 7.0).toDF("x"),
      Seq(1.0, 7.0, 7.0, 7.0).toDF("x"), $"x", 0.0, 10.0, 2)
      .as[Double].head()
    assert(math.abs(pb - got) < 1e-15)
    // an EMPTY side (all-null batch — the incident a monitor exists to
    // catch) reads as +Inf, never a smoothing-floor divide-by-zero;
    // empty vs empty is 0 (no evidence)
    val empty = Seq(Option.empty[java.lang.Double]).toDF("x")
    val inf = Profile.psiBetween(Seq(1.0, 7.0).toDF("x"),
      empty, $"x", 0.0, 10.0, 2).as[Double].head()
    assert(inf.isPosInfinity)
    val zz = Profile.psiBetween(empty, empty, $"x", 0.0, 10.0, 2)
      .as[Double].head()
    assert(zz === 0.0)
  }

  test("winsorize: per-group exact-percentile clamp, originals preserved") {
    val df = Seq(
      ("g1", 0.0), ("g1", 10.0), ("g1", 20.0), ("g1", 30.0), ("g1", 1000.0),
      ("g2", 5.0), ("g2", 5.0)
    ).toDF("g", "v")
    // g1 p25/p75 over sorted (0,10,20,30,1000): exact interpolated
    // percentile → 10.0 and 30.0; g2 degenerate → both bounds 5.0
    val got = Profile.winsorize(df, Seq("g"), "v", 0.25, 0.75)
      .select("g", "v", "v_lo", "v_hi", "v_w")
      .as[(String, Double, Double, Double, Double)].collect().toSet
    assert(got === Set(
      ("g1", 0.0, 10.0, 30.0, 10.0),
      ("g1", 10.0, 10.0, 30.0, 10.0),
      ("g1", 20.0, 10.0, 30.0, 20.0),
      ("g1", 30.0, 10.0, 30.0, 30.0),
      ("g1", 1000.0, 10.0, 30.0, 30.0),
      ("g2", 5.0, 5.0, 5.0, 5.0)))
  }

  test("quantileBuckets: left-closed cells, on-bound values land low, depth ≈ equal") {
    val df = (1 to 8).map(i => ("g", i.toDouble)).toDF("g", "v")
    // quartile bounds of 1..8: p25=2.75, p50=4.5, p75=6.25
    val got = Profile.quantileBuckets(df, Seq("g"), "v", 4)
      .select("v", "v_bucket").as[(Double, Long)].collect().toMap
    assert(got === Map(1.0 -> 0L, 2.0 -> 0L, 3.0 -> 1L, 4.0 -> 1L,
      5.0 -> 2L, 6.0 -> 2L, 7.0 -> 3L, 8.0 -> 3L))
    // a value exactly ON a bound stays in the LOWER bucket
    val onBound = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0)).toDF("g", "v")
    // bounds of (1,2,3) at 1/3, 2/3: ~1.67, ~2.33 — but with n=2
    // buckets the single bound is the median 2.0 and v=2.0 must bin 0
    val two = Profile.quantileBuckets(onBound, Seq("g"), "v", 2)
      .select("v", "v_bucket").as[(Double, Long)].collect().toMap
    assert(two === Map(1.0 -> 0L, 2.0 -> 0L, 3.0 -> 1L))
  }

  test("corrExact: hand-computed coefficients, constant column yields NULL, partition-invariant") {
    val df = Seq((1.0, 2.0, 7.0), (2.0, 4.0, 7.0), (3.0, 6.0, 7.0),
      (4.0, 7.0, 7.0)).toDF("x", "y", "c")
    val got = Profile.corrExact(df, Seq("x", "y", "c"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    // x,y nearly collinear: corr = 19/sqrt(5*77.help) — compute from
    // the same closed form the operator uses
    val n = 4.0; val sx = 10.0; val sy = 19.0; val sxy = 56.0
    val ssx = 30.0; val ssy = 105.0
    val expected = (n * sxy - sx * sy) /
      math.sqrt((n * ssx - sx * sx) * (n * ssy - sy * sy))
    assert(math.abs(got(("x", "y"))._2.get - expected) < 1e-15)
    assert(got(("x", "c"))._2.isEmpty && got(("y", "c"))._2.isEmpty,
      "zero-variance side must yield NULL, not NaN")
    // bit-stability under repartitioning — the reason this exists
    val a = Profile.corrExact(df, Seq("x", "y")).collect()(0).getDouble(3)
    val b = Profile.corrExact(df.repartition(7), Seq("x", "y"))
      .collect()(0).getDouble(3)
    assert(java.lang.Double.doubleToLongBits(a) ===
      java.lang.Double.doubleToLongBits(b))
  }

  test("drift against an empty-snapshot profile yields null deltas, not a throw") {
    val a = Profile.profile(planted, Seq("id"), exactDistinct = true)
    val b = Profile.profile(planted.filter(lit(false)), Seq("id"), exactDistinct = true)
    val row = Profile.drift(a, b).collect().head
    assert(row.isNullAt(1)) // null_frac_delta: b_n = 0 → null, no ANSI error
  }

  test("clusterCards: size, dominant value, count-tie to smallest value") {
    val assign = Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 200L), (5L, 200L))
      .toDF("id", "cid")
    val meta = Seq((1L, 7), (2L, 7), (3L, 5), (4L, 9), (5L, 3))
      .toDF("mid", "lbl")
    val out = Profile.clusterCards(assign, "id", "cid", meta, "mid", $"lbl")
      .orderBy("cid").collect()
    // cluster 100: 3 members, label 7 dominates (2 of 3);
    // cluster 200: 1-1 tie between labels 3 and 9 → smallest value wins
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ===
      Seq((100L, 3L, 7L, 2L), (200L, 2L, 3L, 1L)))
  }

  test("chiSquareReport: hand-computed 2x2, degenerate margins, invariance") {
    import org.apache.spark.sql.functions.col
    // A: 4 units 2 conversions, B: 4 units 0 → classic 2×2 chi² =
    // 8·(2·4 − 2·0)²/(4·4·2·6) = 8/3 ≈ 2.666666; each group
    // contributes (x·N − n·X)²/(n·X·(N−X)) = 64/48 → 1333333 micro
    val units = Seq(("A", 1L), ("A", 1L), ("A", 0L), ("A", 0L),
      ("B", 0L), ("B", 0L), ("B", 0L), ("B", 0L)).toDF("g", "f")
    def rep(df: org.apache.spark.sql.DataFrame) =
      Profile.chiSquareReport(df, col("g"), col("f"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), BigDecimal(r.getDecimal(3))))).toMap
    assert(rep(units) === Map(
      "A" -> ((4L, 2L, BigDecimal(1333333))),
      "B" -> ((4L, 0L, BigDecimal(1333333)))))
    // degenerate margin: nobody converts → zero contributions, no
    // division by the zero variance
    val none = Seq(("A", 0L), ("B", 0L)).toDF("g", "f")
    assert(rep(none) === Map(
      "A" -> ((1L, 0L, BigDecimal(0))),
      "B" -> ((1L, 0L, BigDecimal(0)))))
    // everybody converts → same by symmetry
    val all = Seq(("A", 1L), ("B", 1L)).toDF("g", "f")
    assert(rep(all) === Map(
      "A" -> ((1L, 1L, BigDecimal(0))),
      "B" -> ((1L, 1L, BigDecimal(0)))))
    // equal rates → exactly zero chi², and partition invariance
    val eq = Seq(("A", 1L), ("A", 0L), ("B", 1L), ("B", 0L)).toDF("g", "f")
    assert(rep(eq).values.map(_._3).sum === BigDecimal(0))
    assert(rep(units.repartition(7)) === rep(units))
  }
}
