package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage (entity resolution) over STRUCTURED rows — the
  * companion to the document-dedup family for tables: customer/
  * supplier/author records that refer to the same real-world entity
  * under typos and formatting drift. Classic blocking + verify
  * (Fellegi–Sunter lineage): cheap blocking keys bound the candidate
  * set, a caller-supplied field-similarity score verifies each
  * candidate exactly.
  *
  * Scale shape (the same discipline as the text dedup family):
  * candidate generation shuffles only (id, block-key) rows — payload
  * fields join back AFTER the (i, j) set is deduped, so wide records
  * never ride the self-join; multi-pass blocking is a posexplode,
  * not N self-joins; and a block-size cap prunes pathological keys
  * (the df-cap / stop-shingle rule) with the same documented
  * capped-space semantics as `Dedup.ngramJaccardPairsAuto`. A pair
  * is a candidate iff it shares ≥ 1 surviving blocking key — that
  * within-block contract IS the operator's semantics (standard ER),
  * which is what makes it linear instead of all-pairs.
  */
object RecordLink {

  /** Candidate pairs under multi-pass blocking: (i, j, a, b) where
    * a/b are the payload structs of the two records.
    *
    * @param blocks  blocking-key expressions; null keys never block
    * @param payload columns carried into scoring (alias them — struct
    *                field names come from the expressions)
    * @param maxBlockSize keys whose block exceeds this are pruned
    *                (hot-key guard: a degenerate key like an empty
    *                string must not produce an n² block)
    */
  def candidatePairs(df: DataFrame, idCol: Column, blocks: Seq[Column],
      payload: Seq[Column], maxBlockSize: Int = 10000): DataFrame = {
    require(blocks.nonEmpty, "at least one blocking key")
    val rows = df.select(idCol.as("id"), struct(payload: _*).as("p"),
      array(blocks.map(_.cast("string")): _*).as("bks"))
    val keyed = rows.select(col("id"),
      posexplode(col("bks")).as(Seq("bi", "bk")))
      .filter(col("bk").isNotNull)
    val hot = keyed.groupBy("bi", "bk").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBlockSize).select(col("bi"), col("bk"))
    val pruned = keyed.join(hot, Seq("bi", "bk"), "left_anti")
    val cands = pruned.as("x").join(pruned.as("y"),
        col("x.bi") === col("y.bi") && col("x.bk") === col("y.bk") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("i"), col("y.id").as("j"))
      .distinct()
    cands
      .join(rows.select(col("id").as("i"), col("p").as("a")), "i")
      .join(rows.select(col("id").as("j"), col("p").as("b")), "j")
  }

  /** Blocked + verified links: (i, j, score) for candidates with
    * score ≥ minScore. `score(a, b)` sees the two payload structs —
    * compose per-field comparators freely (banded `levenshtein(l, r,
    * k)` for names, exact equality for codes, abs-difference bands
    * for numerics).
    */
  def linkPairs(df: DataFrame, idCol: Column, blocks: Seq[Column],
      payload: Seq[Column], score: (Column, Column) => Column,
      minScore: Column, maxBlockSize: Int = 10000): DataFrame =
    candidatePairs(df, idCol, blocks, payload, maxBlockSize)
      .select(col("i"), col("j"), score(col("a"), col("b")).as("score"))
      .filter(col("score") >= minScore)

  /** Entity ids: transitively close the link graph
    * ([[Dedup.connectedComponents]] — alternating-star, O(log² n)
    * rounds) so a↔b↔c resolves to ONE entity even when a↔c never
    * scored. Returns (id, entity) for every linked record.
    */
  def linkClusters(df: DataFrame, idCol: Column, blocks: Seq[Column],
      payload: Seq[Column], score: (Column, Column) => Column,
      minScore: Column, maxBlockSize: Int = 10000): DataFrame =
    Dedup.connectedComponents(
      linkPairs(df, idCol, blocks, payload, score, minScore, maxBlockSize)
        .select(col("i"), col("j")))
      .withColumnRenamed("rep", "entity")
}
