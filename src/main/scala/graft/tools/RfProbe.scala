package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Bloom

/** Runtime-filter probe: when a big fact joins a SELECTIVE small-ish
  * side that is still past the broadcast threshold (the large-large
  * semi-join shape), does Spark 4's injected runtime Bloom filter
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) already cut
  * the fact exchange, and does a HOUSE Bloom prefilter (our mergeable
  * `Bloom` sketch broadcast into a codegen'd `bloomContains` scan
  * predicate) add anything on top? Decides with numbers whether graft
  * needs a prefilter-join operator or a documented conf.
  *
  * modes: `off` (runtime filters disabled), `on` (Spark defaults),
  * `house` (runtime filters off + our sketch prefilter).
  *
  * args: [dir] [rep]
  */
object RfProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val rep = if (args.length > 1) args(1).toInt else 200
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
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
    // wide fact so the exchange is byte-heavy; 100k distinct keys
    val fact = ev.crossJoin(spark.range(rep.toLong).select(col("id").as("rep")))
      .select(pmod(col("event_id") * rep + col("rep"), lit(100000L)).as("k"),
        col("value"), col("props"))
    // selective non-broadcastable side: 1% of the key space, with a
    // filter Spark can see (the runtime-filter creation site)
    val dimAll = fact.select(col("k")).distinct()
      .withColumn("w", pmod(col("k"), lit(997L)))
    val dim = dimAll.filter(col("w") < lit(10L)) // ~1% selectivity
    val n = fact.count()
    println(s"rf fact_rows=$n dim_keys=~1000")

    def agg(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy(col("k"))
        .agg(sum(col("value")).as("s"), count(lit(1)).as("c"))
        .agg(count(lit(1)), sum(col("c"))).collect()(0).getLong(0)

    for (mode <- Seq("off", "on", "house")) {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
        (mode == "on").toString)
      var best = Double.MaxValue
      var out = 0L
      for (_ <- 1 to 2) {
        val (r, sec) = time {
          mode match {
            case "house" =>
              // one pass over the (small) dim builds the sketch; the
              // broadcast 1-row sketch probes the fact IN THE SCAN,
              // before the exchange — only survivors shuffle
              val sk = dim.agg(Bloom.bloomSketch(
                graft.functions.SimHash.fnv1a64(col("k").cast("string")),
                m = 1 << 16, k = 5).as("sk"))
              val pre = fact.crossJoin(broadcast(sk))
                .filter(Bloom.bloomContains(col("sk"),
                  graft.functions.SimHash.fnv1a64(col("k").cast("string"))))
                .drop("sk")
              agg(pre.join(dim, Seq("k")))
            case _ =>
              agg(fact.join(dim, Seq("k")))
          }
        }
        best = math.min(best, sec); out = r
      }
      println(f"rf mode=$mode groups=$out sec=$best%.2f")
    }
    spark.stop()
  }
}
