package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints formatted physical plans for selected queries so
  * pushdown / broadcast / codegen properties can be reviewed.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q1_agg", "q_enrich_broadcast", "q_filter", "q_window_tumbling",
      "q_join_product", "q_embed_pairs", "q_embed_topk", "q_embed_ivf",
      "q_window_logic", "q_window_late", "q_dedup_ngram", "q_dedup_minhash")
    names.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
