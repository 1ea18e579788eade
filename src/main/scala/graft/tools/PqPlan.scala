package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{PqModel, Similarity}
object PqPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .appName("pq-plan").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.load(spark, "/root/repo/data/sf1", "embeddings")
    val model = PqModel.fixed(64, 8, 16, seed = 7L)
    val df = Similarity.ivfPqTopK(emb, "vec_id", "embedding", 3, model, 142, 2, 0)
    val plan = df.queryExecution.optimizedPlan.toString
    plan.linesIterator.zipWithIndex.foreach { case (l, i) =>
      val tag = if (l.contains("pqencode")) " <<< ENCODE" else ""
      println(f"PLAN $i%3d ${l.take(200)}$tag")
    }
    spark.stop()
  }
}
