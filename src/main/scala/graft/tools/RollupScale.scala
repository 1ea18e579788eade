package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Maintain

/** Scale audit for [[Maintain.refreshAgg]] (incremental rollup
  * maintenance) and [[graft.functions.Validate.report]] (one-scan
  * constraint suite).
  *
  * refreshAgg's claim: maintaining a per-customer rollup under a
  * change batch costs ~the snapshot scan + a touched-group-sized
  * aggregate, vs the full recompute's corpus-wide aggregate exchange —
  * and the gap should WIDEN as the change fraction shrinks (the daily-
  * maintenance regime: |changes| ≪ |base|).
  *
  * Validate's claim: the N-check report costs ONE scan, not N — the
  * comparison is the same checks issued as N separate aggregates.
  *
  * SPARK_GRAFT_SF_DIR=<dir with orders/lineitem> sbt "runMain graft.tools.RollupScale"
  */
object RollupScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(reps: Int)(act: => Long): (Double, Long) = {
      var best = Double.MaxValue; var out = 0L
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        out = act
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, out)
    }

    val ords = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val nOrders = ords.count()
    System.err.println(s"[rollupscale] $sfDir orders=$nOrders")

    val aggs = Seq(count(lit(1)).as("n"),
      sum(col("o_totalprice").cast("decimal(12,2)")).as("spend"))
    // the maintained rollup is a MATERIALIZED artifact by definition —
    // it exists from the previous run; cache stands in for its parquet
    val prev = ords.groupBy(col("o_custkey")).agg(aggs.head, aggs.tail: _*).cache()
    prev.count()

    for (k <- Seq(10L, 100L, 1000L)) {
      val changes = ords.filter(col("o_orderkey") % k === 0)
        .select(col("o_orderkey"), (col("o_custkey") + 1L).as("o_custkey"),
          (col("o_totalprice") + 1000.0).as("o_totalprice"),
          (col("o_orderkey") % (k * 3) === 0).as("del"))
      val (tFull, nFull) = time(2) {
        Maintain.upsert(ords, changes, "o_orderkey", Some("del"))
          .groupBy(col("o_custkey")).agg(aggs.head, aggs.tail: _*).count()
      }
      val (tInc, nInc) = time(2) {
        Maintain.refreshAgg(prev, ords, changes, "o_orderkey",
          Seq("o_custkey"), aggs, Some("del")).count()
      }
      val (tDelta, nDelta) = time(2) {
        Maintain.refreshAggDelta(prev, ords, changes, "o_orderkey",
          Seq("o_custkey"), Seq(("o_totalprice", "spend")), "n",
          Some("del")).count()
      }
      require(nFull == nInc && nFull == nDelta,
        s"row mismatch: full=$nFull inc=$nInc delta=$nDelta")
      println(f"refresh k=1/$k%-5d groups=$nFull%9d  full=$tFull%6.2fs  touched=$tInc%6.2fs (${tFull / tInc}%4.2fx)  delta=$tDelta%6.2fs (${tFull / tDelta}%4.2fx)")
    }
    prev.unpersist()

    // ---- Validate: one-scan vs per-check scans over lineitem ----
    val liPath = new java.io.File(s"$sfDir/lineitem.parquet")
    if (liPath.exists()) {
      import graft.functions.Validate
      import graft.functions.Validate._
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val checks = Seq(
        NotNull("l_returnflag"), NotNull("l_shipdate"), Unique("l_orderkey"),
        Bounds("l_quantity", 1.0, 25.0), Bounds("l_discount", 0.0, 0.08),
        InSet("l_returnflag", Seq("A", "N", "R")), Pattern("l_linestatus", "^[OF]$"))
      val (tOne, _) = time(2) { Validate.report(li, checks).count() }
      val (tN, _) = time(2) {
        checks.map(c => Validate.report(li, Seq(c)).count()).sum
      }
      println(f"validate checks=${checks.length} fused=$tOne%6.2fs  per-check=$tN%6.2fs  win=${tN / tOne}%4.2fx")
    }
    spark.stop()
  }
}
