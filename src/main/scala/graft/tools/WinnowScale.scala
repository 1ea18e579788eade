package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Reproduce the winnowPairs scale comparison at any SF dir (the
  * counterpart of [[AnnScale]] for the fingerprint index): run the
  * gate's parameters and a production-capped variant, print wall
  * seconds and pair counts. The cost driver is Σ C(df,2) over the
  * fingerprint index — the df cap is the knob that bounds it.
  *
  * args: [sfDir] [k] [w] [minOverlap] [capA] [capB]
  */
object WinnowScale {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/repo/data/sf1"
    val k = if (args.length > 1) args(1).toInt else 16
    val w = if (args.length > 2) args(2).toInt else 4
    val ov = if (args.length > 3) args(3).toDouble else 0.5
    val capA = if (args.length > 4) args(4).toInt else 1000
    val capB = if (args.length > 5) args(5).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, dir, "documents")
    for (cap <- Seq(capA, capB)) {
      val t0 = System.nanoTime()
      val n = graft.functions.Dedup.winnowPairs(docs, col("doc_id"), col("text"),
        k, w, ov, cap).count()
      spark.catalog.clearCache()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"cap":$cap,"pairs":$n,"sec":$s%.1f}""")
    }
    spark.stop()
  }
}
