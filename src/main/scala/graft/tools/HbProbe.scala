package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Hll, Sampling}

/** Round-1 memory bisect for the frontier-pruned HyperBall: the 10M
  * decade OOM'd at the default 8 g heap where the round-11 dense
  * formulation passed, so this probe runs ONE sweep round under each
  * formulation variant at the GraphScale shape and reports
  * pass/wall. Variants:
  *
  *  - dense: the r11 shape — (pulled ∪ cur) grouped merge, inner
  *    join back to cur for prev-fields
  *  - frontier: the full new shape — pulled-only grouped delta, LEFT
  *    join into cur, scalar merge2 + conditional estimate projection
  *  - join: the new join WITHOUT the merge2/estimate projection
  *    (carries dsk through) — isolates join memory from expression
  *    memory
  *  - proj: frontier but with the projection collapsed to a single
  *    select (no withColumn chain)
  *
  * args: [edges (default 10,000,000)] [variant]
  */
object HbProbe {
  def main(args: Array[String]): Unit = {
    val nEdges = if (args.length > 0) args(0).toLong else 10000000L
    val variant = if (args.length > 1) args(1) else "frontier"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ckpt = java.nio.file.Files.createTempDirectory("hbprobe-ckpt")
    spark.sparkContext.setCheckpointDir(ckpt.toString)

    val n = nEdges * 2
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = spark.range(nEdges).select(
        pmod(xxhash64(col("id")), lit(n)).as("src"),
        pmod(xxhash64(col("id"), lit(1)), lit(n)).as("dst"))
      .distinct().repartition(col("src")).persist(lvl)
    e.count()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val cur = nodes.groupBy(col("id"))
      .agg(Hll.hllSketch(Sampling.splitmix64(col("id")), 8).as("sk"))
      .select(col("id"), col("sk"), Hll.hllEstimate(col("sk")).as("est"),
        lit(0.0).as("harmonic"), lit(0.0).as("sumd"))
      .persist(lvl).checkpoint(false)
    println(s"""{"probe":"init","rows":${cur.count()}}""")

    val t0 = System.nanoTime()
    val out: DataFrame = variant match {
      case "dense" =>
        val pulled = e.join(cur.select(col("id").as("src"), col("sk")),
            Seq("src"))
          .select(col("dst").as("id"), col("sk"))
        val merged = pulled.unionByName(cur.select(col("id"), col("sk")))
          .groupBy(col("id")).agg(Hll.hllMerge(col("sk")).as("sk"))
        merged.join(cur.select(col("id"), col("sk").as("__psk"),
            col("est").as("__pest"), col("harmonic"), col("sumd")),
          Seq("id"))
          .select(col("id"), col("sk"), Hll.hllEstimate(col("sk")).as("est"),
            (col("harmonic") +
              greatest(Hll.hllEstimate(col("sk")) - col("__pest"), lit(0.0)))
              .as("harmonic"),
            (col("sk") =!= col("__psk")).as("__grew"))
      case "join" =>
        val pulled = e.join(cur.select(col("id").as("src"), col("sk")),
            Seq("src"))
          .select(col("dst").as("id"), col("sk"))
        val delta = pulled.groupBy(col("id"))
          .agg(Hll.hllMerge(col("sk")).as("__dsk"))
        cur.join(delta, Seq("id"), "left")
          .select(col("id"), col("sk"), col("est"),
            (length(coalesce(col("__dsk"), col("sk")))).as("dl"))
      case "proj" =>
        val pulled = e.join(cur.select(col("id").as("src"), col("sk")),
            Seq("src"))
          .select(col("dst").as("id"), col("sk"))
        val delta = pulled.groupBy(col("id"))
          .agg(Hll.hllMerge(col("sk")).as("__dsk"))
        cur.join(delta, Seq("id"), "left")
          .select(col("id"),
            when(col("__dsk").isNull, col("sk"))
              .otherwise(Hll.hllMerge2(col("sk"), col("__dsk"))).as("sk"),
            col("est"), col("harmonic"), col("sumd"))
      case _ =>
        val pulled = e.join(cur.select(col("id").as("src"), col("sk")),
            Seq("src"))
          .select(col("dst").as("id"), col("sk"))
        val delta = pulled.groupBy(col("id"))
          .agg(Hll.hllMerge(col("sk")).as("__dsk"))
        cur.join(delta, Seq("id"), "left")
          .withColumn("__nsk", when(col("__dsk").isNull, col("sk"))
            .otherwise(Hll.hllMerge2(col("sk"), col("__dsk"))))
          .withColumn("__grew", col("__nsk") =!= col("sk"))
          .withColumn("__nest", when(col("__grew"),
            Hll.hllEstimate(col("__nsk"))).otherwise(col("est")))
          .select(col("id"), col("__nsk").as("sk"), col("__nest").as("est"),
            (col("harmonic") + when(col("__grew"),
              greatest(col("__nest") - col("est"), lit(0.0)))
              .otherwise(lit(0.0))).as("harmonic"),
            col("__grew"))
    }
    val p = out.persist(lvl)
    val ck = p.checkpoint(false)
    val rows = ck.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"probe":"$variant","rows":$rows,"sec":$sec%.1f}""")
    spark.stop()
  }
}
