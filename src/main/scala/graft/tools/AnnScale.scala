package graft.tools

import org.apache.spark.sql.SparkSession
import graft.functions.Similarity

/** Measures the ANN scale knobs at a given SF dir: the gate-pinned
  * parameters (nlist=16 / bits=4 — sized for DuckDB-oracle
  * tractability, quadratic once the corpus outgrows them) against the
  * corpus-derived auto parameters (nlist ≈ √N, bits ≈ log2(N/64)).
  * Evidence for the scaling table in ROUND4.md. arg: sfDir.
  */
object AnnScale {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/data/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.load(spark, dir, "embeddings")
    println(s"corpus ${emb.count()} vectors @ $dir")
    def t(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"ANN $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    t("warmup (ivf gate)") { Similarity.ivfTopK(emb, "vec_id", "embedding", 3, 16, 2, 0) }
    t("ivf gate nlist=16 it=2") { Similarity.ivfTopK(emb, "vec_id", "embedding", 3, 16, 2, 2) }
    t("ivf auto nlist=sqrt(N) it=2") { Similarity.ivfTopKAuto(emb, "vec_id", "embedding", 3) }
    t("lsh gate bits=4") { Similarity.lshTopK(emb, "vec_id", "embedding", 3, 4) }
    t("lsh auto bits=log2(N/64)") { Similarity.lshTopKAuto(emb, "vec_id", "embedding", 3) }
    spark.stop()
  }
}
