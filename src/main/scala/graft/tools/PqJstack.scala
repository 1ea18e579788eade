package graft.tools
import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.functions.{PqModel, Similarity}
import org.apache.spark.sql.functions._
object PqJstack {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("pq-jstack").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.load(spark, "/root/repo/data/sf1", "embeddings")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    emb.count()
    val model = PqModel.train(emb, col("vec_id"), col("embedding"), m = 8, ksub = 256)
    val df = Similarity.ivfPqTopK(emb, "vec_id", "embedding", 3, model, 142, 2)
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.zipWithIndex.foreach { case (l, i) =>
      val c = l.replaceAll("#\\d+[L]?", "")
      if (c.contains("pqencode")) println(f"PQJ $i%3d ENCODE>> ${c.trim.take(130)}")
      else if (c.matches(".*(Sort |Window|Exchange|Join|Filter|InMemory).*")) println(f"PQJ $i%3d ${c.trim.take(110)}")
    }
    spark.stop()
  }
}
