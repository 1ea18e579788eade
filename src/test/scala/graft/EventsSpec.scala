package graft

import org.apache.spark.sql.functions._
import graft.functions.Events

/** Event-sequence analytics: funnel ordering/span/monotonicity by
  * hand, cohort floor-bucket closed forms, sessionization boundary
  * exactness and tie determinism.
  */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "us", "event_type")

  test("funnel: earliest completion, strict ordering, span cutoff, drop-off") {
    val e = ev(
      // user 1 completes inside span 10 of t1=10: view@10, click@15,
      // purchase@18; the later view@15 and the click@5 BEFORE t1 must
      // not matter (earliest t1; clicks before t1 don't count)
      (1L, 10L, "view"), (1L, 15L, "view"), (1L, 5L, "click"),
      (1L, 15L, "click"), (1L, 18L, "purchase"),
      // user 2: click at the SAME instant as the view — strictly-after
      // means no advance; a later click@25 lands outside span 10
      (2L, 10L, "view"), (2L, 10L, "click"), (2L, 25L, "click"),
      // user 3: view+click but purchase BEFORE the click — drop-off at
      // step 3 (purchase@12 is not after click@14)
      (3L, 10L, "view"), (3L, 14L, "click"), (3L, 12L, "purchase"),
      // user 4: no view at all — not in the output
      (4L, 10L, "click"), (4L, 20L, "purchase"))
    val f = Events.funnel(e, "user_id", "us", "event_type",
      Seq("view", "click", "purchase"), Some(10L))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(f === Map(
      1L -> ((Some(10L), Some(15L), Some(18L))),
      2L -> ((Some(10L), None, None)),
      3L -> ((Some(10L), Some(14L), None))))
    // without the span, user 2's click@25 advances step 2
    val open = Events.funnel(e, "user_id", "us", "event_type",
      Seq("view", "click", "purchase"))
      .filter($"user" === 2L).collect().head
    assert(Option(open.get(2)) === Some(25L))
  }

  test("funnel: repeated step types need strictly increasing times") {
    val e = ev((1L, 10L, "view"), (1L, 11L, "view"),
      (2L, 10L, "view"))
    val f = Events.funnel(e, "user_id", "us", "event_type",
      Seq("view", "view")).collect()
      .map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(f === Map(1L -> Some(11L), 2L -> None))
  }

  test("funnelReport: per-step reached counts, zero-filled") {
    val e = ev((1L, 10L, "view"), (1L, 20L, "click"),
      (2L, 10L, "view"))
    val r = Events.funnelReport(e, "user_id", "us", "event_type",
      Seq("view", "click", "purchase")).collect()
      .map(x => x.getInt(0) -> ((x.getString(1), x.getLong(2)))).toMap
    assert(r === Map(1 -> (("view", 2L)), 2 -> (("click", 1L)),
      3 -> (("purchase", 0L))))
  }

  test("cohortRetention: floor buckets, offsets, distinct-per-bucket counts") {
    val e = ev(
      // user 1: first bucket 1 (us 10..19), active in buckets 1 and 3
      // (two events in bucket 3 count once)
      (1L, 10L, "x"), (1L, 31L, "x"), (1L, 35L, "x"),
      // user 2: cohort 1, active only there
      (2L, 19L, "x"),
      // user 3: cohort 2
      (3L, 20L, "x"), (3L, 30L, "x"))
    val r = Events.cohortRetention(e, "user_id", "us", 10L).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(r === Map((1L, 0L) -> 2L, (1L, 2L) -> 1L,
      (2L, 0L) -> 1L, (2L, 1L) -> 1L))
  }

  private def att(rows: Seq[(Long, Long, String, Long)], model: String,
      lookback: Long = 100L, unit: Long = 1000000L): Map[Long, Long] =
    Events.attribution(
      rows.toDF("user_id", "us", "event_type", "event_id"),
      "user_id", "us", "event_type", "event_id", "event_type",
      convType = "buy", touchTypes = Seq("view", "click"),
      lookbackUs = lookback, model = model, unit = unit)
      .collect().map(r => r.getLong(2) -> r.getLong(6)).toMap

  test("attribution: all four models on a hand-built 3-touch journey") {
    // touches id 10@1, 11@2, 12@3; conversion @4
    val e = Seq((1L, 1L, "view", 10L), (1L, 2L, "click", 11L),
      (1L, 3L, "view", 12L), (1L, 4L, "buy", 99L))
    assert(att(e, "linear") ===
      Map(10L -> 333333L, 11L -> 333333L, 12L -> 333333L))
    assert(att(e, "first") === Map(10L -> 1000000L, 11L -> 0L, 12L -> 0L))
    assert(att(e, "last") === Map(10L -> 0L, 11L -> 0L, 12L -> 1000000L))
    assert(att(e, "position") ===
      Map(10L -> 400000L, 11L -> 200000L, 12L -> 400000L))
  }

  test("attribution: position n=1 and n=2 splits, odd unit floors deterministically") {
    val one = Seq((1L, 1L, "view", 10L), (1L, 4L, "buy", 99L))
    assert(att(one, "position", unit = 5L) === Map(10L -> 5L))
    val two = Seq((1L, 1L, "view", 10L), (1L, 2L, "click", 11L),
      (1L, 4L, "buy", 99L))
    // unit 5: first gets 5 DIV 2 = 2, last gets the remainder 3
    assert(att(two, "position", unit = 5L) === Map(10L -> 2L, 11L -> 3L))
  }

  test("attribution: same-instant touches tie-break by id; window edges strict/closed") {
    // two touches at the SAME us — first = min id, last = max id
    val tie = Seq((1L, 2L, "view", 9L), (1L, 2L, "click", 7L),
      (1L, 4L, "buy", 99L))
    assert(att(tie, "first") === Map(7L -> 1000000L, 9L -> 0L))
    assert(att(tie, "last") === Map(7L -> 0L, 9L -> 1000000L))
    // conv@100, lookback 10: touch@100 excluded (strictly before),
    // touch@90 included (closed lower edge), touch@89 excluded
    val w = Seq((1L, 100L, "view", 1L), (1L, 90L, "view", 2L),
      (1L, 89L, "view", 3L), (1L, 100L, "buy", 99L))
    assert(att(w, "linear", lookback = 10L) === Map(2L -> 1000000L))
  }

  test("attribution: spreadSkew re-key changes the plan, never the rows") {
    val rows = Seq((1L, 1L, "view", 10L), (1L, 2L, "click", 11L),
      (1L, 3L, "view", 12L), (1L, 5L, "buy", 90L), (1L, 8L, "buy", 91L),
      (2L, 4L, "view", 20L), (2L, 7L, "buy", 92L))
    def run(spread: String) = Events.attribution(
        rows.toDF("user_id", "us", "event_type", "event_id"),
        "user_id", "us", "event_type", "event_id", "event_type",
        "buy", Seq("view", "click"), 100L, "position",
        spreadSkew = spread)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(6))).toSet
    // auto on a tiny corpus takes the no-re-key branch (below the
    // 2^20 pair floor) — all three modes row-identical
    assert(run("on") === run("off"))
    assert(run("auto") === run("off"))
  }

  test("attribution: same-instant duplicate conversions attribute once; zero-touch convs vanish") {
    val e = Seq((1L, 1L, "view", 10L), (1L, 4L, "buy", 98L),
      (1L, 4L, "buy", 99L), // duplicate instant — ONE conversion
      (2L, 50L, "buy", 97L)) // user 2 has no touches
    val d = Events.attribution(
      e.toDF("user_id", "us", "event_type", "event_id"),
      "user_id", "us", "event_type", "event_id", "event_type",
      "buy", Seq("view", "click"), 100L, "linear")
    assert(d.collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(6)))
      .toSeq === Seq((1L, 10L, 1000000L)))
  }

  test("sessionize: gap boundary is strict, first event opens, ties stay together") {
    val e = ev(
      (1L, 0L, "a"), (1L, 10L, "b"),   // gap == 10 → SAME session
      (1L, 21L, "c"),                    // gap 11 > 10 → new session
      (1L, 21L, "d"),                    // tie: same session as c
      (2L, 5L, "e"))
    val s = Events.sessionize(e, "user_id", "us", 10L).collect()
      .map(r => r.getString(2) -> r.getLong(3)).toMap
    assert(s === Map("a" -> 1L, "b" -> 1L, "c" -> 2L, "d" -> 2L, "e" -> 1L))
  }

  test("transitions: per-user consecutive pairs, tie-break total order") {
    val e = Seq(
      (1L, 10L, "a", 1L), (1L, 20L, "b", 2L), (1L, 30L, "a", 3L),
      // user 2: tied instant — event_id orders x(4) before y(5)
      (2L, 10L, "x", 5L), (2L, 10L, "w", 4L), (2L, 20L, "x", 6L),
      // user 3: single event — no transition
      (3L, 10L, "a", 7L))
      .toDF("user_id", "us", "event_type", "eid")
    val t = Events.transitions(e, "user_id", "us", "event_type", Seq("eid"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(t === Map(("a", "b") -> 1L, ("b", "a") -> 1L,
      ("w", "x") -> 1L, ("x", "x") -> 1L))
  }

  test("robustStats: lower median and MAD by hand, odd and even counts") {
    val e = Seq(("g", 1L), ("g", 3L), ("g", 7L), ("g", 100L),
      ("h", 5L), ("h", 5L), ("h", 9L))
      .toDF("grp", "v")
    val r = Events.robustStats(e, "grp", "v").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    // g sorted 1,3,7,100 (n=4): lower median = 2nd = 3; devs 0,2,4,97
    //   → MAD = 2nd = 2. h sorted 5,5,9 (n=3): med = 2nd = 5; devs
    //   0,0,4 → MAD = 0.
    assert(r === Map("g" -> ((4L, 3L, 2L)), "h" -> ((3L, 5L, 0L))))
  }

  test("anomalies: exact k·MAD boundary is strict; nulls never flag") {
    val e = Seq(("g", java.lang.Long.valueOf(1L)),
      ("g", java.lang.Long.valueOf(3L)), ("g", java.lang.Long.valueOf(7L)),
      ("g", java.lang.Long.valueOf(100L)), ("g", null.asInstanceOf[java.lang.Long]))
      .toDF("grp", "v")
    // med=3, mad=2, k=2 → threshold 4: dev 0,2 keep; dev 4 (v=7) is AT
    // the boundary — strict > keeps it; dev 97 flags
    val a = Events.anomalies(e, "grp", "v", 2L).collect()
      .map(r => Option(r.get(1)).map(_.toString).orNull -> r.getBoolean(4))
      .toMap
    assert(a === Map("1" -> false, "3" -> false, "7" -> false,
      "100" -> true, null.asInstanceOf[String] -> false))
  }

  test("resampleLocf: grid fill, in-bucket last by (time, tie), negative floor buckets") {
    val e = Seq(
      // user 1: bucket 0 has two obs (last at us=9 wins); bucket 1
      // empty (fills from 0); bucket 2 tie at us=25 → eid breaks it;
      // bucket 4 observed, bucket 3 fills
      (1L, 5L, 1L, 50L), (1L, 9L, 2L, 90L),
      (1L, 25L, 4L, 111L), (1L, 25L, 3L, 222L),
      (1L, 45L, 5L, 450L),
      // user 2: single negative-time obs — floor bucket −3, one row
      (2L, -25L, 6L, 7L))
      .toDF("user_id", "us", "event_id", "v")
    val r = graft.functions.Events
      .resampleLocf(e, "user_id", "us", "v", 10L, Seq("event_id"))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> ((x.getLong(2), x.getLong(3))))
      .toMap
    assert(r === Map(
      (1L, 0L) -> ((0L, 90L)), (1L, 1L) -> ((10L, 90L)),
      (1L, 2L) -> ((20L, 111L)), (1L, 3L) -> ((30L, 111L)),
      (1L, 4L) -> ((40L, 450L)),
      (2L, -3L) -> ((-30L, 7L))))
  }

  test("cusum: the closed form reproduces the max(0, ·) recursion by hand") {
    // series d = x − ref with ref 10: x = 15,2,13,30 → d = 5,−8,3,20
    // recursion: S = 5, 0 (clamped), 3, 23 — the clamp must RESET the
    // accumulation, not carry the negative excursion
    val e = Seq((1L, 1L, 15L), (1L, 2L, 2L), (1L, 3L, 13L), (1L, 4L, 30L),
      (2L, 1L, 9L)) // single below-ref event: S = 0, never negative
      .toDF("user_id", "us", "v")
    val out = graft.functions.Events
      .cusum(e, "user_id", "us", "v", 10L, 22L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(out === Map(
      (1L, 1L) -> ((5L, false)), (1L, 2L) -> ((0L, false)),
      (1L, 3L) -> ((3L, false)),
      (1L, 4L) -> ((23L, true)), // 23 > 22; the boundary is strict
      (2L, 1L) -> ((0L, false))))
    // exactly at the threshold does not flag
    val at = graft.functions.Events
      .cusum(e, "user_id", "us", "v", 10L, 23L)
      .filter(col("is_shift")).count()
    assert(at === 0L)
  }

  test("robustStats: unitScale rounds doubles to micro-units") {
    val e = Seq(("g", 1.234), ("g", 1.236), ("g", 9.999))
      .toDF("grp", "v")
    val r = Events.robustStats(e, "grp", "v", 100L).collect().head
    // cents: 123, 124, 1000 → med 124; devs 0, 1, 876 → mad 1
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((3L, 124L, 1L)))
  }

  test("rfm: per-user aggregates, on-bound coding low, composite digits") {
    // 4 users, engineered so every axis has a clean quartile story:
    // u1: late + many + big; u4: early + few + small
    val e = Seq(
      (1L, 400L, 40.0), (1L, 410L, 40.0), (1L, 420L, 20.0), (1L, 430L, 0.0),
      (2L, 300L, 30.0), (2L, 310L, 30.0), (2L, 320L, 15.0),
      (3L, 200L, 20.0), (3L, 210L, 30.0),
      (4L, 100L, 10.0)
    ).toDF("user_id", "us", "value")
    val got = Events.rfm(e, "user_id", "us", "value", nBuckets = 4)
      .select(col("user"), col("r_us"), col("f"),
        col("m").cast("double"), col("r_b"), col("f_b"), col("m_b"), col("rfm"))
      .as[(Long, Long, Long, Double, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    // per-user: r_us = 430/320/210/100, f = 4/3/2/1, m = 100/75/50/10
    assert(got.map(t => (t._1, t._2, t._3, t._4)) === Seq(
      (1L, 430L, 4L, 100.0), (2L, 320L, 3L, 75.0),
      (3L, 210L, 2L, 50.0), (4L, 100L, 1L, 10.0)))
    // 4 distinct values per axis → quartile bounds are the
    // interpolated interior points; each user lands in its own
    // bucket, composite reads as decimal digits
    assert(got.map(t => (t._5, t._6, t._7, t._8)) === Seq(
      (3L, 3L, 3L, 333L), (2L, 2L, 2L, 222L),
      (1L, 1L, 1L, 111L), (0L, 0L, 0L, 0L)))
  }
}
