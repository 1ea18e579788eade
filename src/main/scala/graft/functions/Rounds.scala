package graft.functions

import org.apache.spark.sql.DataFrame

/** Round-checkpoint lifecycle shared by the iterative operators
  * (graph fixpoints, the funnel's per-step reached relations — the
  * [[Dedup.connectedComponents]] pattern): `mark` materializes a
  * round into a checkpoint (EAGER — it runs the round's job),
  * `release` frees a superseded round's storage. With a session
  * checkpoint dir set, rounds use reliable checkpoints — set one in
  * production: checkpoint FILES survive executor loss and cache
  * eviction, while the fallback local blocks are a truncated
  * lineage whose loss is unrecoverable (observed once at 126M nodes
  * on an 8 GB heap under GC-pressure eviction).
  */
private[graft] final class Rounds(anchor: DataFrame) {
  private val sc = anchor.sparkSession.sparkContext
  private val reliable = sc.getCheckpointDir.isDefined
  private val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  private def checkpointRddOf(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.logical.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  def mark(r: DataFrame): DataFrame = markN(r)._1

  /** [[mark]], returning the materialized row count alongside the
    * checkpoint. The count job ALREADY runs inside every mark — loops
    * that need an emptiness/fixpoint test should read it from here
    * instead of calling `.isEmpty`/`.count()` on the checkpoint,
    * which launches one extra (small but round-multiplied) Spark job
    * per round.
    */
  def markN(r: DataFrame): (DataFrame, Long) =
    if (reliable) {
      val p = r.persist(lvl)
      val ck = p.checkpoint(false)
      val n = ck.count()
      p.unpersist(false)
      (ck, n)
    } else {
      val ck = r.localCheckpoint(false)
      val n = ck.count()
      (ck, n)
    }

  def release(m: DataFrame): Unit =
    checkpointRddOf(m).foreach { rdd =>
      if (reliable) rdd.getCheckpointFile.foreach { f =>
        val path = new org.apache.hadoop.fs.Path(f)
        path.getFileSystem(sc.hadoopConfiguration).delete(path, true)
      }
      else rdd.unpersist(false)
    }
}
