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

  /** Two-table candidates: probe records against a REFERENCE table
    * (master-data matching — incoming records vs the entity table)
    * under the same multi-pass blocking. Returns (i, j, a, b) with
    * i from `probe`, j from `ref`; no i<j dedupe (the sides are
    * distinct universes). The reference side's keyed rows build once
    * — mark the ref DataFrame cached/bucketed for serve-many.
    *
    * STREAMING-NATIVE: when `probe` is a streaming DataFrame this is
    * a stream-static equi-join on (bi, bk) + a stateless verify — no
    * state store, no foreachBatch, exactly Spark's intended
    * stream-static shape (spec-pinned batch/stream parity).
    * Hot-key pruning uses the REFERENCE side's block sizes (the
    * probe side is unbounded in streams; a runaway reference block
    * is the n² risk either way).
    */
  def candidatePairsAgainst(probe: DataFrame, probeId: Column,
      ref: DataFrame, refId: Column, blocks: Seq[Column],
      payload: Seq[Column], maxBlockSize: Int = 10000): DataFrame = {
    require(blocks.nonEmpty, "at least one blocking key")
    def keyed(df: DataFrame, id: Column) =
      df.select(id.as("id"), struct(payload: _*).as("p"),
        array(blocks.map(_.cast("string")): _*).as("bks"))
        .select(col("id"), col("p"), col("bks"),
          posexplode(col("bks")).as(Seq("bi", "bk")))
        .filter(col("bk").isNotNull)
    val refKeyed = keyed(ref, refId)
    val hot = refKeyed.groupBy("bi", "bk").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBlockSize).select(col("bi"), col("bk"))
    val refSide = refKeyed.join(hot, Seq("bi", "bk"), "left_anti")
      .select(col("bi"), col("bk"), col("id").as("j"), col("p").as("b"),
        col("bks").as("jbks"))
    val probeSide = keyed(probe, probeId)
      .select(col("bi"), col("bk"), col("id").as("i"), col("p").as("a"),
        col("bks").as("ibks"))
    probeSide.join(refSide, Seq("bi", "bk"))
      // first-shared-key rule instead of a dedupe: keep the join row
      // only if NO earlier key index is shared — at most one row per
      // pair by construction, so no dropDuplicates (which would be a
      // STATEFUL operator on a stream). A pair whose first shared key
      // was hot-pruned is dropped entirely — the same documented
      // capped-space semantics as the n-gram df cap.
      .filter(!exists(
        zip_with(slice(col("ibks"), lit(1), col("bi")),
          slice(col("jbks"), lit(1), col("bi")),
          (x, y) => x.isNotNull && y.isNotNull && x === y),
        v => v))
      .select(col("i"), col("j"), col("a"), col("b"))
  }

  /** Blocked + verified two-table links: (i, j, score). Streaming
    * probe supported (see [[candidatePairsAgainst]]); re-arrivals
    * across micro-batches are the source's at-least-once contract.
    */
  def linkAgainst(probe: DataFrame, probeId: Column,
      ref: DataFrame, refId: Column, blocks: Seq[Column],
      payload: Seq[Column], score: (Column, Column) => Column,
      minScore: Column, maxBlockSize: Int = 10000): DataFrame =
    candidatePairsAgainst(probe, probeId, ref, refId, blocks, payload, maxBlockSize)
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
