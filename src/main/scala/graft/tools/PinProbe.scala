package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: how many partitions does a repartition(col)+persist pinned
  * layout actually get under AQE at a given SF, and what does the
  * per-round join plan look like against it.
  */
object PinProbe {
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
    val pinned = edges.repartition(col("src")).persist(lvl)
    println("pinned count = " + pinned.count())
    println("pinned rdd partitions = " + pinned.rdd.getNumPartitions)
    val rank = edges.select(col("src").as("id")).distinct()
      .withColumn("rank", lit(1L))
      .localCheckpoint(false)
    println("rank partitions = " + rank.rdd.getNumPartitions)
    val j = pinned.join(rank, pinned("src") === rank("id"))
      .groupBy(col("dst")).agg(sum(col("rank")).as("s"))
    j.write.format("noop").mode("overwrite").save()
    println(j.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
