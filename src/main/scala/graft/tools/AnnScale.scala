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

    // Pair path (the SemDeDup generator): fixed-bits gate form vs the
    // corpus-sized auto forms, with recall vs the exact all-pairs
    // truth stratified by true similarity (pairs are
    // exact-cosine-verified, so precision is 1.0 by construction;
    // recall is the LSH colocation probability, which rises steeply
    // with similarity — the ≥0.9 band is the one semantic dedup acts
    // on). Threshold matches the q_embed_dedup gate (0.3).
    import org.apache.spark.sql.functions.col
    val th = 0.3
    val truth = Similarity.cosinePairs(emb, "vec_id", "embedding", th)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val t0 = System.nanoTime()
    val bands = Seq(0.3, 0.6, 0.9)
    val nTruth = bands.map(b => b -> truth.filter(col("sim") >= b).count()).toMap
    println(f"ANN pairs brute truth          ${(System.nanoTime() - t0) / 1e9}%7.2f s  (${nTruth(0.3)} pairs; ${nTruth(0.6)} at >=0.6, ${nTruth(0.9)} at >=0.9)")
    def pr(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t1 = System.nanoTime()
      val got = f.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = got.count()
      val sec = (System.nanoTime() - t1) / 1e9
      val hit = got.join(truth, Seq("i", "j")).persist()
      val rec = bands.map { b =>
        val d = nTruth(b)
        if (d == 0) 1.0 else hit.filter(col("sim") >= b).count().toDouble / d
      }
      hit.unpersist(false); got.unpersist(false)
      println(f"ANN $name%-28s $sec%7.2f s  ($n pairs, recall ${rec(0)}%.3f | >=0.6 ${rec(1)}%.3f | >=0.9 ${rec(2)}%.3f)")
    }
    pr("pairs gate bits=4 (sign)") {
      Similarity.bucketedCosinePairs(emb, "vec_id", "embedding", th, 4) }
    pr("pairs auto 1 table") {
      Similarity.bucketedCosinePairsAuto(emb, "vec_id", "embedding", th, tables = 1) }
    pr("pairs auto 8 tables") {
      Similarity.bucketedCosinePairsAuto(emb, "vec_id", "embedding", th) }
    truth.unpersist(false)
    spark.stop()
  }
}
