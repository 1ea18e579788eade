package graft.queries

import org.apache.spark.sql._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Ops
import graft.windowing._

/** Correctness-gate queries for the windowing surface (SURVEY §2.4).
  * Window starts are emitted as epoch millis (long) — identical under
  * Spark's µs timestamps and DuckDB's ns timestamps.
  */
object WindowQueries {

  /** Exact-cents average for fold_window (udaf over window groups). */
  private class CentsSum extends Aggregator[Double, (Long, Long), Double] {
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), v: Double): (Long, Long) = (b._1 + math.round(v * 100), b._2 + 1)
    def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) = (a._1 + b._1, a._2 + b._2)
    def finish(r: (Long, Long)): Double = r._1 / 100.0
    def bufferEncoder: Encoder[(Long, Long)] = Encoders.product
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  private val clock = EventClock("ts")

  /** Non-aggregatable per-window logic for q_window_logic: an ordered
    * first-3-event digest + count of ascending value steps. Both facts
    * depend on the in-window event order (the ascending-step count needs
    * each previous value), so no commutative Aggregator fold computes
    * them — exactly the shape the reference's arbitrary WindowLogic
    * (windowing.py:958-1028) exists for.
    * V=(event_id, value); W=(first3, n_asc, n);
    * S=(firstIds, lastValue, hasLast, nAsc, n).
    */
  private object FirstKDigestLogic
    extends WindowLogicOps.WindowLogic[(Long, Double), (String, Long, Long), (Vector[Long], Double, Boolean, Long, Long)] {
    def init: (Vector[Long], Double, Boolean, Long, Long) = (Vector.empty, 0.0, false, 0L, 0L)
    def onValue(st: (Vector[Long], Double, Boolean, Long, Long), v: (Long, Double)) = {
      val (first, last, has, nAsc, n) = st
      val first2 = if (n < 3) first :+ v._1 else first
      val nAsc2 = if (has && v._2 > last) nAsc + 1 else nAsc
      ((first2, v._2, true, nAsc2, n + 1), Seq.empty)
    }
    def onClose(st: (Vector[Long], Double, Boolean, Long, Long)) =
      Seq((st._1.mkString(","), st._4, st._5))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // tumbling window: hourly count+sum per event_type
    "q_window_tumbling" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      Windowing.aggWindow(ev, clock, TumblingWindower("1 hour"), Seq($"event_type"),
        Seq(count(lit(1)).as("n"),
          sum($"value".cast("decimal(12,2)")).cast("double").as("total")))
        .select(unix_millis($"window.start").as("win_start"), $"event_type", $"n", $"total")
    },

    // sliding window: 1h length, 30m offset — each event in 2 windows
    "q_window_sliding" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      Windowing.countWindow(ev, clock, SlidingWindower("1 hour", "30 minutes"), Seq($"event_type"), "n")
        .select(unix_millis($"window.start").as("win_start"), $"event_type", $"n")
    },

    // session window: 2h gap per user; emits session start + size
    "q_window_session" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"user_id".cast("string").as(Ops.KEY), $"ts")
      Windowing.countWindow(ev, clock, SessionWindower("2 hours"), Seq(col(Ops.KEY)), "n")
        .select($"key", unix_millis($"window.start").as("start_ms"), $"n")
    },

    // tumbling with align_to: 1h windows anchored at :30 (reference
    // align_to -> window() startTime offset)
    "q_window_aligned" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      Windowing.countWindow(ev, clock, TumblingWindower("1 hour", "30 minutes"),
        Seq($"event_type"), "n")
        .select(unix_millis($"window.start").as("win_start"), $"event_type", $"n")
    },

    // fold_window: custom Aggregator (udaf) per (window, key)
    "q_fold_window" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      val centsSum = udaf(new CentsSum)
      Windowing.aggWindow(ev, clock, TumblingWindower("1 day"), Seq($"event_type"),
        Seq(centsSum($"value").as("total"), count(lit(1)).as("n")))
        .select(unix_millis($"window.start").as("win_start"), $"event_type",
          $"total", ($"total" / $"n").as("avg_value"))
    },

    // reduce_window: first-value-init fold ≡ max here
    "q_reduce_window" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      Windowing.aggWindow(ev, clock, TumblingWindower("1 day"), Seq($"event_type"),
        Seq(max($"event_id").as("last_eid")))
        .select(unix_millis($"window.start").as("win_start"), $"event_type", $"last_eid")
    },

    // collect_window: daily gathered event ids per user
    "q_collect_window" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"user_id".cast("string").as(Ops.KEY), $"ts", $"event_id")
      Windowing.collectWindow(ev, clock, TumblingWindower("1 day"), Seq(col(Ops.KEY)), $"event_id")
        .select($"key", unix_millis($"window.start").as("win_start"),
          concat_ws(",", $"values").as("eids"))
    },

    // collect_window set mode: distinct event types per (user, day)
    "q_collect_window_set" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"user_id".cast("string").as(Ops.KEY), $"ts", $"event_type")
      Windowing.collectWindowSet(ev, clock, TumblingWindower("1 day"), Seq(col(Ops.KEY)), $"event_type")
        .select($"key", unix_millis($"window.start").as("win_start"),
          concat_ws(",", $"values").as("types"))
    },

    // collect_window dict mode: per (user, day) the last event_id per
    // event_type ("last" by event_id — bounded data has no arrival order)
    "q_collect_window_map" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"user_id".cast("string").as(Ops.KEY), $"ts", $"event_type", $"event_id")
      Windowing.collectWindowMap(ev, clock, TumblingWindower("1 day"), Seq(Ops.KEY),
        $"event_type", $"event_id", $"event_id")
        .select($"key", unix_millis($"window.start").as("win_start"), $"entries")
    },

    // count_window
    "q_count_window" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"user_id".cast("string").as(Ops.KEY), $"ts")
      Windowing.countWindow(ev, clock, TumblingWindower("1 day"), Seq(col(Ops.KEY)), "n")
        .select($"key", unix_millis($"window.start").as("win_start"), $"n")
    },

    // max_window / min_window (min with `by` = value of earliest event)
    "q_max_window" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      Windowing.maxWindow(ev, clock, TumblingWindower("1 day"), Seq($"event_type"), $"value", None, "mx")
        .select(unix_millis($"window.start").as("win_start"), $"event_type", $"mx")
    },
    "q_min_window" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      Windowing.minWindow(ev, clock, TumblingWindower("1 day"), Seq($"event_type"), $"value",
        by = Some($"event_id"), as = "first_value")
        .select(unix_millis($"window.start").as("win_start"), $"event_type", $"first_value")
    },

    // window metadata stream (WindowOut.meta)
    "q_window_meta" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      val down = Windowing.countWindow(ev, clock, TumblingWindower("1 day"), Seq($"event_type"), "n")
      Windowing.windowMeta(down)
        .select(unix_millis($"open_time").as("open_ms"), unix_millis($"close_time").as("close_ms"))
        .distinct()
    },

    // generic WindowLogic: ordered daily digest per user — first-3 event
    // ids + ascending-step count, via the secondary-sort window engine
    "q_window_logic" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"user_id".cast("string").as("key"), $"ts", $"event_id", $"value")
      WindowLogicOps.windowLogicBatch[(Long, Double), (String, Long, Long), (Vector[Long], Double, Boolean, Long, Long)](
          ev, "key", clock, TumblingWindower("1 day"), Seq($"event_id"),
          r => (r.getAs[Long]("event_id"), r.getAs[Double]("value")), FirstKDigestLogic)
        .select($"_1".as("key"), $"_2".as("win_start"),
          $"_4._1".as("first3"), $"_4._2".as("n_asc"), $"_4._3".as("n"))
    },

    // WindowOut.late tee on bounded data: rows more than 2h behind their
    // key's max event time — the rows a per-key event clock with
    // waitFor=2h would have routed to the late stream
    "q_window_late" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"user_id".cast("string").as("key"), $"ts", $"event_id")
      graft.streaming.StreamingOps.lateTee(ev, "ts", "'2 hours'", $"key")
        .select($"key", $"event_id")
    },

    // generic WindowLogic over SLIDING windows (1h length, 30m offset —
    // each event digested in 2 overlapping windows)
    "q_window_logic_sliding" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"user_id".cast("string").as("key"), $"ts", $"event_id", $"value")
      WindowLogicOps.windowLogicBatch[(Long, Double), (String, Long, Long), (Vector[Long], Double, Boolean, Long, Long)](
          ev, "key", clock, SlidingWindower("1 hour", "30 minutes"), Seq($"event_id"),
          r => (r.getAs[Long]("event_id"), r.getAs[Double]("value")), FirstKDigestLogic)
        .select($"_1".as("key"), $"_2".as("win_start"),
          $"_4._1".as("first3"), $"_4._2".as("n_asc"), $"_4._3".as("n"))
    },

    // generic WindowLogic over SESSION windows: same ordered digest per
    // 2h-gap session — exercises the inline sessionization path of the
    // batch engine (split strictly past gap; touch extends)
    "q_window_logic_session" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"user_id".cast("string").as("key"), $"ts", $"event_id", $"value")
      WindowLogicOps.windowLogicBatch[(Long, Double), (String, Long, Long), (Vector[Long], Double, Boolean, Long, Long)](
          ev, "key", clock, SessionWindower("2 hours"), Seq($"event_id"),
          r => (r.getAs[Long]("event_id"), r.getAs[Double]("value")), FirstKDigestLogic)
        .select($"_1".as("key"), $"_2".as("win_start"),
          $"_4._1".as("first3"), $"_4._2".as("n_asc"), $"_4._3".as("n"))
    },

    // join_window: daily per-user first click × first purchase
    "q_join_window" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"user_id".cast("string").as(Ops.KEY), $"ts", $"event_id", $"event_type")
      def side(t: String, as: String) =
        (ev.filter($"event_type" === t), min($"event_id"), as)
      Windowing.joinWindow(clock, TumblingWindower("1 day"), Ops.KEY,
        Seq(side("click", "click_eid"), side("purchase", "purch_eid")))
        .select($"key", unix_millis($"window.start").as("win_start"), $"click_eid", $"purch_eid")
    })

  private val bucketHour = "time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))"
  private val bucketDay = "time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP))"

  val oracle: Map[String, String] = Map(
    "q_window_tumbling" ->
      s"""SELECT epoch_ms($bucketHour) AS win_start, event_type, COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q_window_sliding" ->
      """SELECT epoch_ms(time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) - k * INTERVAL '30 minutes') AS win_start,
        |  event_type, COUNT(*) AS n
        |FROM events CROSS JOIN (VALUES (0), (1)) t(k)
        |GROUP BY 1, 2""".stripMargin,
    "q_window_session" ->
      """WITH m AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL '2 hours'
        |           OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         THEN 1 ELSE 0 END AS news
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    SUM(news) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT CAST(user_id AS VARCHAR) AS key, epoch_ms(MIN(ts)) AS start_ms, COUNT(*) AS n
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "q_window_aligned" ->
      """SELECT epoch_ms(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP), TIMESTAMP '2000-01-01 00:30:00')) AS win_start,
        |  event_type, COUNT(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_fold_window" ->
      s"""SELECT epoch_ms($bucketDay) AS win_start, event_type,
         |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total,
         |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_value
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q_reduce_window" ->
      s"""SELECT epoch_ms($bucketDay) AS win_start, event_type, MAX(event_id) AS last_eid
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q_collect_window" ->
      s"""SELECT CAST(user_id AS VARCHAR) AS key, epoch_ms($bucketDay) AS win_start,
         |  string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id) AS eids
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q_count_window" ->
      s"""SELECT CAST(user_id AS VARCHAR) AS key, epoch_ms($bucketDay) AS win_start, COUNT(*) AS n
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q_collect_window_set" ->
      s"""SELECT CAST(user_id AS VARCHAR) AS key, epoch_ms($bucketDay) AS win_start,
         |  string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q_collect_window_map" ->
      s"""WITH last_per AS (
         |  SELECT CAST(user_id AS VARCHAR) AS key, $bucketDay AS w, event_type,
         |    MAX(event_id) AS v
         |  FROM events GROUP BY 1, 2, 3)
         |SELECT key, epoch_ms(w) AS win_start,
         |  string_agg(event_type || ':' || CAST(v AS VARCHAR), ',' ORDER BY event_type || ':' || CAST(v AS VARCHAR)) AS entries
         |FROM last_per GROUP BY 1, 2""".stripMargin,
    "q_max_window" ->
      s"""SELECT epoch_ms($bucketDay) AS win_start, event_type, MAX(value) AS mx
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q_min_window" ->
      s"""SELECT epoch_ms($bucketDay) AS win_start, event_type, arg_min(value, event_id) AS first_value
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q_window_meta" ->
      s"""SELECT DISTINCT epoch_ms($bucketDay) AS open_ms,
         |  epoch_ms($bucketDay + INTERVAL '1 day') AS close_ms
         |FROM events""".stripMargin,
    "q_window_late" ->
      """WITH t AS (SELECT CAST(user_id AS VARCHAR) AS key,
        |             CAST(ts AS TIMESTAMP) AS tsu, event_id FROM events),
        |m AS (SELECT key, tsu, event_id,
        |        MAX(tsu) OVER (PARTITION BY key) AS mx FROM t)
        |SELECT key, event_id FROM m
        |WHERE tsu < mx - INTERVAL '2 hours'""".stripMargin,
    "q_window_logic" ->
      """WITH o AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key,
        |    time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)) AS w,
        |    CAST(ts AS TIMESTAMP) AS tsu, event_id, value
        |  FROM events),
        |o2 AS (
        |  SELECT key, w, tsu, event_id, value,
        |    LAG(value) OVER (PARTITION BY key, w ORDER BY tsu, event_id) AS pv,
        |    ROW_NUMBER() OVER (PARTITION BY key, w ORDER BY tsu, event_id) AS rn
        |  FROM o)
        |SELECT key, epoch_ms(w) AS win_start,
        |  string_agg(CASE WHEN rn <= 3 THEN CAST(event_id AS VARCHAR) END, ',' ORDER BY tsu, event_id) AS first3,
        |  COUNT(*) FILTER (WHERE value > pv) AS n_asc,
        |  COUNT(*) AS n
        |FROM o2 GROUP BY key, w""".stripMargin,
    "q_window_logic_sliding" ->
      """WITH o AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key,
        |    time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) - k * INTERVAL '30 minutes' AS w,
        |    CAST(ts AS TIMESTAMP) AS tsu, event_id, value
        |  FROM events CROSS JOIN (VALUES (0), (1)) t(k)),
        |o2 AS (
        |  SELECT key, w, tsu, event_id, value,
        |    LAG(value) OVER (PARTITION BY key, w ORDER BY tsu, event_id) AS pv,
        |    ROW_NUMBER() OVER (PARTITION BY key, w ORDER BY tsu, event_id) AS rn
        |  FROM o)
        |SELECT key, epoch_ms(w) AS win_start,
        |  string_agg(CASE WHEN rn <= 3 THEN CAST(event_id AS VARCHAR) END, ',' ORDER BY tsu, event_id) AS first3,
        |  COUNT(*) FILTER (WHERE value > pv) AS n_asc,
        |  COUNT(*) AS n
        |FROM o2 GROUP BY key, w""".stripMargin,
    "q_window_logic_session" ->
      """WITH o AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key, CAST(ts AS TIMESTAMP) AS tsu,
        |    event_id, value
        |  FROM events),
        |m AS (
        |  SELECT key, tsu, event_id, value,
        |    CASE WHEN tsu - LAG(tsu) OVER (PARTITION BY key ORDER BY tsu, event_id) > INTERVAL '2 hours'
        |           OR LAG(tsu) OVER (PARTITION BY key ORDER BY tsu, event_id) IS NULL
        |         THEN 1 ELSE 0 END AS news
        |  FROM o),
        |s AS (
        |  SELECT key, tsu, event_id, value,
        |    SUM(news) OVER (PARTITION BY key ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m),
        |r AS (
        |  SELECT key, sid, tsu, event_id, value,
        |    LAG(value) OVER (PARTITION BY key, sid ORDER BY tsu, event_id) AS pv,
        |    ROW_NUMBER() OVER (PARTITION BY key, sid ORDER BY tsu, event_id) AS rn
        |  FROM s)
        |SELECT key, epoch_ms(MIN(tsu)) AS win_start,
        |  string_agg(CASE WHEN rn <= 3 THEN CAST(event_id AS VARCHAR) END, ',' ORDER BY tsu, event_id) AS first3,
        |  COUNT(*) FILTER (WHERE value > pv) AS n_asc,
        |  COUNT(*) AS n
        |FROM r GROUP BY key, sid""".stripMargin,
    "q_join_window" ->
      s"""WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key, $bucketDay AS w, MIN(event_id) AS click_eid
         |           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
         |     p AS (SELECT CAST(user_id AS VARCHAR) AS key, $bucketDay AS w, MIN(event_id) AS purch_eid
         |           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
         |SELECT c.key AS key, epoch_ms(c.w) AS win_start, c.click_eid, p.purch_eid
         |FROM c JOIN p ON c.key = p.key AND c.w = p.w""".stripMargin)
}
