package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: where do q_graph_clustering's seconds go vs
  * q_graph_triangles at sf0.1. */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.1f s"); r
    }
    val l = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val raw = l.as("x").join(l.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_suppkey") < col("y.l_suppkey"))
      .select(col("x.l_suppkey").as("src"), col("y.l_suppkey").as("dst"))
    println("edges distinct = " + t("edge distinct count")(raw.distinct().count()))
    val tri1 = t("triangles(raw) build")(graft.functions.Graph.triangles(raw))
    println("rows " + t("triangles(raw) consume")(tri1.count()))
    val e = raw.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val tri2 = t("triangles(canonical) build")(graft.functions.Graph.triangles(e))
    println("rows " + t("triangles(canonical) consume")(tri2.count()))
    val cc = t("clusteringCoefficient build")(
      graft.functions.Graph.clusteringCoefficient(raw))
    println("rows " + t("clusteringCoefficient consume")(cc.count()))
    spark.stop()
  }
}
