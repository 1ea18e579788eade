package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale harness for Graph.pageRank: synthetic graph (the CcScale
  * random shape — ~2N nodes at N edges, so degrees are small and
  * plentiful — or a hub-skewed shape where ~20% of edges point at a
  * 16-node hub set, the web-graph regime), fixed iterations, then the
  * invariants validated DISTRIBUTEDLY (no driver union of ranks):
  *
  *  - every node carries rank >= base (the (1-d)/N floor term)
  *  - Σ rank <= unit (mass never inflates; dangling/floor leak only)
  *  - rank relation has exactly one row per node
  *  - partition-invariance at the first decade: repartition(17) input
  *    yields the identical rank relation (except-count 0 both ways)
  *
  * args: [edges (default 1,000,000)] [iterations (default 3)]
  *       [shape: random|hub]
  */
object GraphScale {
  def main(args: Array[String]): Unit = {
    val nEdges = if (args.length > 0) args(0).toLong else 1000000L
    val iters = if (args.length > 1) args(1).toInt else 3
    val shape = if (args.length > 2) args(2) else "random"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Reliable round checkpoints (the cluster-recommended mode): the
    // local-block path lost evicted blocks once under 8g-heap GC
    // pressure at the third decade — checkpoint files don't evict.
    val ckpt = java.nio.file.Files.createTempDirectory("graphscale-ckpt")
    spark.sparkContext.setCheckpointDir(ckpt.toString)

    val n = nEdges * 2
    val edges = (shape match {
      case "hub" =>
        // 20% of edges land on a 16-node hub set: heavy in-degree skew
        spark.range(nEdges).select(
          pmod(xxhash64(col("id")), lit(n)).as("src"),
          when(pmod(xxhash64(col("id"), lit(2)), lit(5)) === 0,
            pmod(xxhash64(col("id"), lit(3)), lit(16)))
            .otherwise(pmod(xxhash64(col("id"), lit(1)), lit(n))).as("dst"))
      case _ =>
        spark.range(nEdges).select(
          pmod(xxhash64(col("id")), lit(n)).as("src"),
          pmod(xxhash64(col("id"), lit(1)), lit(n)).as("dst"))
    }).cache()
    edges.count()

    val unit = 1000000000000L
    val t0 = System.nanoTime()
    val pr = graft.functions.Graph.pageRank(edges, iters).cache()
    val nodes = pr.count()
    val sec = (System.nanoTime() - t0) / 1e9

    val nodeCount = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct().count()
    val base = java.math.BigDecimal.valueOf((unit * 150L / 1000L) / nodeCount)
    val belowBase = pr.filter(col("rank") < lit(base)).count()
    val total = pr.agg(sum(col("rank")).cast("decimal(38,0)")).head().getDecimal(0)
    val dupIds = pr.groupBy(col("id")).count().filter(col("count") > 1).count()

    var mismatch = -1L
    if (nEdges <= 1000000L) {
      val pr2 = graft.functions.Graph.pageRank(edges.repartition(17), iters)
      mismatch = pr.exceptAll(pr2).count() + pr2.exceptAll(pr).count()
    }

    println(f"""{"edges":$nEdges,"iters":$iters,"shape":"$shape","nodes":$nodes,"sec":$sec%.1f,"below_base":$belowBase,"total_rank":${total},"unit":$unit,"dup_ids":$dupIds,"partition_mismatch":$mismatch}""")
    require(nodes == nodeCount && belowBase == 0 && dupIds == 0 &&
      total.compareTo(java.math.BigDecimal.valueOf(unit)) <= 0 &&
      mismatch <= 0, "invariant violation")
    spark.stop()
  }
}
