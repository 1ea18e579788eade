package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{CacheScope, Dedup}

/** Microprobe: full vs banded levenshtein on the ACTUAL sf candidate pairs. */
object LevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/data/sf1")
    val docs = Tables.load(spark, sfDir, "documents")
    val scope = new CacheScope
    val cands = Dedup.ngramJaccardPairsAuto(docs, col("doc_id"), col("text"), 3, 0.5, scope)
      .select(col("i"), col("j"))
    val d = docs.select(col("doc_id").as("id"), col("text"))
    val joined = cands
      .join(d.select(col("id").as("i"), col("text").as("ta")), "i")
      .join(d.select(col("id").as("j"), col("text").as("tb")), "j")
      .select(col("ta"), col("tb")).cache()
    println("pairs=" + joined.count())
    println(joined.select(avg(length(col("ta"))), max(length(col("ta")))).collect().mkString)
    def t(name: String, c: org.apache.spark.sql.Column): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        joined.select(sum(c)).collect()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$name%-10s $best%.3f s")
    }
    t("full", levenshtein(col("ta"), col("tb")))
    for (k <- Seq(8, 32, 128)) t(s"banded_$k", levenshtein(col("ta"), col("tb"), k))
    println(joined.select(sum(when(levenshtein(col("ta"), col("tb"), 32) >= 0, 1).otherwise(0)),
      avg(levenshtein(col("ta"), col("tb")))).collect().mkString)
    scope.close()
    spark.stop()
  }
}
