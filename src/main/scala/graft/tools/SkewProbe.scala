package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Join-side skew: measure Spark's AQE skew-join against a manual
  * salted join on a crafted hot-key workload, to decide (with
  * numbers) whether graft needs a salted-join OPERATOR or whether
  * owning the right AQE conf is the correct house answer — the
  * aggregation-side skew story is already operator-owned (df-capped
  * inverted indexes, hot-key caps in RecordLink, partial-agg
  * sketches), but large-large join skew is the classic cluster
  * killer the brief calls out.
  *
  * Workload: `events` fact re-keyed so ONE user owns `hotPct`% of all
  * rows, joined to a per-user dimension built from the distinct keys,
  * with a non-trivial aggregate after the join. Variants:
  *   - `aqe`      — sort-merge join, AQE skew-join ON (house default)
  *   - `noaqe`    — sort-merge join, AQE skew-join OFF (the naive plan)
  *   - `salt`     — manual 16-way salting: fact key → (key, salt),
  *                  dim replicated 16× — the hand fix AQE replaces
  * Broadcast is disabled for the dim (autoBroadcastJoinThreshold=-1)
  * so the exchange actually happens — at 100 TB the dim of a
  * real skewed join is not broadcastable.
  *
  * args: [dir] [rep] (default sf0.1, 20× replication)
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val rep = if (args.length > 1) args(1).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // make the skew detector able to fire on a local-scale corpus
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val ev = Tables.load(spark, dir, "events")
    // replicate the fact rep-fold, then route 40% of rows to ONE key
    val fact = ev.crossJoin(spark.range(rep.toLong).select(col("id").as("rep")))
      .select(
        when(pmod(col("event_id") * rep + col("rep"), lit(10L)) < 4L, lit(0L))
          .otherwise(pmod(col("event_id") * rep + col("rep"), lit(100000L)))
          .as("k"),
        col("value"))
    val dim = fact.select(col("k")).distinct()
      .withColumn("w", pmod(col("k"), lit(97L)).cast("double"))
    val n = fact.count()
    println(s"skew fact_rows=$n hot_share=0.4")

    def agg(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy(col("k")).agg(sum(col("value") * col("w")).as("s"))
        .agg(count(lit(1)), sum(col("s"))).collect()(0).getLong(0)

    for (mode <- Seq("noaqe", "aqe", "force", "salt")) {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
        (mode != "noaqe").toString)
      // the join feeds a SAME-KEY aggregation: splitting the skewed
      // partition would violate the agg's required distribution, so
      // OptimizeSkewedJoin declines by default; force accepts the
      // extra exchange
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin",
        (mode == "force").toString)
      var best = Double.MaxValue
      var out = 0L
      for (_ <- 1 to 2) {
        val (r, sec) = time {
          mode match {
            case "salt" =>
              agg(graft.operators.SkewJoin.saltedJoin(fact, dim, Seq("k"), salt = 16))
            case _ =>
              agg(fact.join(dim, Seq("k")))
          }
        }
        best = math.min(best, sec); out = r
      }
      println(f"skew mode=$mode groups=$out sec=$best%.2f")
    }
    spark.stop()
  }
}
