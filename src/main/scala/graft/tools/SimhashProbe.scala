package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the simhash blocking join at a given SF: computes,
  * per block-count m, the EXACT candidate-pair row count the r-of-m
  * key join must produce (Σ C(cnt,2) over (combo, key) groups) — the
  * number that decides the m trade-off — plus the distinct-sim count
  * (exact-dup collapse potential). Pure aggregations, no pair join.
  *
  * args: [sfDir] [m...]
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/repo/data/sf100"
    val ms = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(8, 9, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, dir, "documents")
    val withSim = docs.select(col("doc_id").as("id"),
      graft.functions.SimHash.simhash64(graft.functions.Text.tokens(col("text"))).as("sim"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = withSim.count()
    val distinctSims = withSim.select(col("sim")).distinct().count()
    println(s"""{"docs":$n,"distinct_sims":$distinctSims}""")
    val maxHamming = 7
    for (m <- ms) {
      val r = m - maxHamming
      val widths = Array.tabulate(m)(c => 64 / m + (if (c < 64 % m) 1 else 0))
      val offsets = widths.scanLeft(0)(_ + _)
      val blockCols = (0 until m).map { c =>
        val mask = if (widths(c) >= 64) -1L else (1L << widths(c)) - 1
        shiftrightunsigned(col("sim"), offsets(c)).bitwiseAND(lit(mask))
      }
      val keyCols = (0 until m).combinations(r).zipWithIndex.map { case (sel, ci) =>
        xxhash64((lit(ci) +: sel.map(blockCols)): _*)
      }.toSeq
      val cand = withSim.select(explode(array(keyCols: _*)).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * (col("c") - 1) / 2).cast("decimal(38,0)"))
        .head().getDecimal(0)
      println(s"""{"m":$m,"r":$r,"candidate_pairs":$cand}""")
    }
    spark.stop()
  }
}
