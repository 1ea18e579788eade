package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Phase-level timing of the pageRank loop at a given SF: edge build,
  * pin+outdeg fold, each iteration's mark — so the per-round cost is
  * visible in isolation (JobProbe's stage names are AQE-anonymized).
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PRPROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    for (round <- 1 to 2) {
      println(s"=== round $round ===")
      val o = graft.Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = graft.Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val half = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + lit(1000000L)).as("dst"))
        .distinct()
      val edges = half.union(
        half.select(col("dst").as("src"), col("src").as("dst")))
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val e0 = edges.select(col("src"), col("dst")).distinct()
      val outdeg = e0.groupBy(col("src")).agg(
        sum(lit(1L)).cast("long").as("od"))
      val e = e0.join(outdeg, Seq("src"))
        .repartition(col("src")).persist(lvl)
      t("build+pin e (count)") { e.count() }
      val nodes0 = e0.select(col("src").as("id"))
        .union(e0.select(col("dst").as("id"))).distinct()
      val based = nodes0
        .select(col("id"), lit(150000000L).as("base"),
          lit(1000000000L).as("r0"))
        .repartition(col("id")).persist(lvl)
      t("build based (count)") { based.count() }
      var cur: DataFrame = t("mark init rank") {
        val c = based.select(col("id"), col("r0").as("rank"))
          .localCheckpoint(false)
        c.count(); c
      }
      for (it <- 1 to 3) {
        val rank = cur
        val contrib = e.join(rank.hint("shuffle_hash"),
            e("src") === rank("id"))
          .select(col("dst").as("id"), expr("rank DIV od").as("c"))
          .groupBy(col("id")).agg(sum(col("c")).cast("long").as("agg"))
        val nxt = t(s"iteration $it mark") {
          val n = based.join(contrib.hint("shuffle_hash"), Seq("id"), "left")
            .select(col("id"),
              (col("base") + expr("(850L * coalesce(agg, 0L)) DIV 1000L"))
                .cast("long").as("rank"))
            .localCheckpoint(false)
          n.count(); n
        }
        cur = nxt
      }
      t("consume final") {
        cur.write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
