package graft

import org.apache.spark.sql.functions._
import graft.functions.Mmr

/** Greedy MMR selection by hand: the diversity term must demote
  * near-duplicates of already-picked results, λ=1000 must degenerate
  * to pure relevance, ties break to the lower id, short candidate
  * lists emit short outputs, and non-integral vectors are rejected.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def cands(rows: (Long, Long, Long, Seq[Int])*) =
    rows.toDF("qid", "nid", "rel", "v")
      .select($"qid", $"nid", $"rel", $"v".cast("array<int>").as("v"))

  private def picks(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long)] =
    df.select($"qid", $"rank", $"nid").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("mmr: diversity demotes the near-duplicate of the first pick") {
    val c = cands(
      (1L, 1L, 10L, Seq(10, 0)),  // top relevance
      (1L, 2L, 9L, Seq(10, 0)),   // near-dup of nid 1 (dot 100)
      (1L, 3L, 2L, Seq(0, 1)))    // orthogonal, low relevance
    // λ=0.5: step1 → nid1 (rel). step2: nid2 obj 500·9−500·100 = −45500
    // vs nid3 500·2−500·0 = 1000 → nid3. step3 → nid2.
    assert(picks(Mmr.mmrRerank(c, "qid", "nid", "rel", "v", 3, 500)) ===
      Seq((1L, 1, 1L), (1L, 2, 3L), (1L, 3, 2L)))
    // λ=1000 degenerates to pure relevance order
    assert(picks(Mmr.mmrRerank(c, "qid", "nid", "rel", "v", 3, 1000)) ===
      Seq((1L, 1, 1L), (1L, 2, 2L), (1L, 3, 3L)))
  }

  test("mmr: ties break to the lower id; short lists emit short outputs") {
    val c = cands(
      (1L, 5L, 7L, Seq(1, 0)),
      (1L, 3L, 7L, Seq(0, 1)),   // same objective at step 1 → lower id
      (2L, 9L, 1L, Seq(2, 2)))   // query 2 has ONE candidate, k=3
    val out = picks(Mmr.mmrRerank(c, "qid", "nid", "rel", "v", 3, 700))
    assert(out.filter(_._1 == 1L).map(_._3) === Seq(3L, 5L))
    assert(out.filter(_._1 == 2L) === Seq((2L, 1, 9L)))
  }

  test("mmr: negative pairwise dots BOOST diversity (max over picked, unclamped)") {
    val c = cands(
      (1L, 1L, 10L, Seq(5, 0)),
      (1L, 2L, 0L, Seq(-5, 0)),  // anti-correlated with pick 1: dot −25
      (1L, 3L, 1L, Seq(0, 0)))   // neutral: dot 0
    // step2 at λ=0.5: nid2 obj = 0 − 500·(−25) = 12500 beats nid3's
    // 500·1 − 0 = 500 — the unclamped max matches the oracle's form
    assert(picks(Mmr.mmrRerank(c, "qid", "nid", "rel", "v", 2, 500)) ===
      Seq((1L, 1, 1L), (1L, 2, 2L)))
  }

  test("mmr: float vectors are rejected (quantize through Int8 first)") {
    val c = Seq((1L, 1L, 10L, Seq(1.0f, 0f))).toDF("qid", "nid", "rel", "v")
    val e = intercept[Exception] {
      Mmr.mmrRerank(c, "qid", "nid", "rel", "v", 2, 500).collect()
    }
    assert(e.getMessage.toLowerCase.contains("mmr_select") ||
      e.getMessage.toLowerCase.contains("integral"))
  }
}
