package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{Search, Text}

/** Stage-level timing probe for the batch phrase gate at sf0.1.
  *
  * FINDING (r11): the gate's ~5-7 s is the starts aggregation, and
  * it is the WORKLOAD, not the plan — the synthetic corpus has only
  * ~30 distinct terms at the phrase-drawing positions, every one of
  * them high-df, so 250 phrases × the dense pruned postings produce
  * ~3.7M (pid, doc, start) candidate rows through the one
  * (map-side-combined) exchange. Sub-stage times: postings 0.1 s
  * warm, term collect 0.1 s, prune 0.1 s, starts 4.4 s, final tail
  * +0.5 s. A per-phrase loop would run 250 jobs against the same
  * postings instead; on an OPEN web vocabulary the pruned relation
  * is query-bounded and the starts blowup disappears (the
  * SearchScale prox rows measure that regime directly).
  */
object PhraseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    for (_ <- 1 to 2) {
      val pp = Search.positionalPostings(docs, col("doc_id"), col("text"))
      time("warm postings")(pp.count())
      val phrases = docs.filter(col("doc_id") % 20 === 0)
        .select(col("doc_id").as("pid"),
          array_join(slice(Text.tokens(col("text")), 5, 3), " ").as("ptext"))
      val ptoks = phrases.select(col("pid"),
          posexplode(Text.tokens(col("ptext"))).as(Seq("i", "term")))
        .select(col("pid"), col("i").cast("long").as("i"), col("term"))
      val plen = ptoks.groupBy(col("pid")).agg(count(lit(1)).as("plen"))
      val distinctTerms = time("distinct terms collect")(
        ptoks.select(col("term")).distinct().limit(4097).collect())
      println(s"  terms: ${distinctTerms.length}")
      val pruned = time("pruned count")(
        pp.filter(col("term").isin(distinctTerms.map(_.getString(0)).toSeq: _*)))
      time("pruned count job")(pruned.count())
      val starts = pruned.join(broadcast(ptoks), Seq("term"))
        .groupBy(col("pid"), col("doc_id"),
          (col("pos") - col("i")).as("start"))
        .agg(count(lit(1)).as("nmatch"))
      time("starts job")(starts.count())
      val fin = starts.join(broadcast(plen), Seq("pid"))
        .filter(col("nmatch") === col("plen"))
        .groupBy(col("pid"), col("doc_id"))
        .agg(count(lit(1)).as("n_occ"))
      time("final job")(fin.count())
    }
    spark.stop()
  }
}
