package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // hamming distance distribution of the high-jaccard planted pairs
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val sims = docs.select($"doc_id".as("id"),
      graft.functions.SimHash.simhash64(graft.functions.Text.tokens($"text")).as("sim"))
    val pairs = graft.functions.Dedup.ngramJaccardPairs(docs, $"doc_id", $"text", 3, 0.9)
    pairs
      .join(sims.select($"id".as("i"), $"sim".as("si")), "i")
      .join(sims.select($"id".as("j"), $"sim".as("sj")), "j")
      .select($"i", $"j", $"jac", graft.functions.SimHash.hamming($"si", $"sj").as("hamming"))
      .orderBy($"hamming".desc)
      .show(30, false)
    spark.stop()
  }
}
