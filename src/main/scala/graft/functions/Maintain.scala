package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus upsert/delete maintenance — applying a CDC-style change
  * batch to a snapshot (the MERGE INTO semantics, without requiring a
  * table format): inserts, replacements, and tombstone deletes in one
  * pass. The companion to [[Dedup.snapshotDiff]] (diff tells you WHAT
  * changed between crawls; upsert APPLIES a change batch to produce
  * the next snapshot) and to [[Layout.compactDir]] (the rewrite step
  * that follows).
  *
  * Scale shape: ONE anti-join keyed on the id removes superseded/
  * deleted base rows, then the surviving changes union in (no
  * shuffle). The change batch of a 100 TB corpus maintenance pass is
  * small relative to the base — below the broadcast threshold the
  * anti-join's build side broadcasts and the BASE NEVER SHUFFLES,
  * which is the property that makes daily upserts affordable; above
  * it, the exchange is keyed on the id and AQE-splittable.
  */
object Maintain {

  /** Apply a KEY-UNIQUE change batch: every change row replaces the
    * base row with the same key (or inserts, if the key is new);
    * rows whose `deleteCol` boolean is true instead REMOVE the key —
    * their other columns are ignored. Change rows (minus `deleteCol`)
    * must be union-compatible with `base` by column name. For change
    * batches with several versions of one key, use [[upsertLatest]];
    * with duplicate keys here, all duplicates survive into the output
    * (they replace the one base row but not each other).
    */
  def upsert(base: DataFrame, changes: DataFrame, keyCol: String,
      deleteCol: Option[String] = None): DataFrame = {
    val touched = changes.select(col(keyCol)).distinct()
    val keep = deleteCol
      .map(d => changes.filter(!coalesce(col(d), lit(false))).drop(d))
      .getOrElse(changes)
    base.join(touched, Seq(keyCol), "left_anti").unionByName(keep)
  }

  /** [[upsert]] for VERSIONED change batches (several changes per key
    * accumulated since the last apply): the row with the greatest
    * `versionCol` wins per key — including a winning tombstone, which
    * deletes the key even when older changes re-inserted it. Ties on
    * the version are broken deterministically by preferring the
    * tombstone (a delete at version v dominates an upsert at v — the
    * conservative read), so the result is a pure function of the
    * change SET, not its arrival order.
    */
  def upsertLatest(base: DataFrame, changes: DataFrame, keyCol: String,
      versionCol: String, deleteCol: Option[String] = None): DataFrame = {
    val delFlag: Column = deleteCol
      .map(d => coalesce(col(d), lit(false))).getOrElse(lit(false))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(versionCol).desc, delFlag.desc)
    // the version is change-batch metadata, not corpus payload — drop
    // it before the apply so the union stays schema-compatible
    val latest = changes
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1).drop("__graft_rn", versionCol)
    upsert(base, latest, keyCol, deleteCol)
  }
}
