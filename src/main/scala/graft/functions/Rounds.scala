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

  def mark(r: DataFrame): DataFrame =
    if (reliable) {
      val p = r.persist(lvl)
      val ck = p.checkpoint(false)
      ck.count()
      p.unpersist(false)
      ck
    } else {
      val ck = r.localCheckpoint(false)
      ck.count()
      ck
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
