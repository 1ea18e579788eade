package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev harness: print the physical plan of one named production path
  * (the per-operator analogue of [[Plans]]'s audit). args: name
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = args.headOption.getOrElse("sample") match {
      case _ => graft.functions.Sampling.hashSample(docs, col("doc_id"), 0.25, 7L)
    }
    println(out.queryExecution.executedPlan.toString.take(1500))
    spark.stop()
  }
}
