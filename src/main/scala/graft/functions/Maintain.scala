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

  /** Type-2 slowly-changing-dimension apply: fold a timestamped
    * change batch into a versioned history table — the metadata face
    * of corpus maintenance (source/license/domain attributes whose
    * past values must stay queryable "as of" any time).
    *
    * `history` carries (`keyCol`, `attrCols`..., `validFromCol`,
    * `validToCol`) with a NULL `validToCol` marking each key's
    * current row; `changes` carries (`keyCol`, `attrCols`...,
    * `changeTsCol`). Per key, the current row and its changes are
    * sequenced by (time, current-first, attrs) and consecutive
    * duplicate attribute tuples collapse (a no-op change never opens
    * a version); each surviving row's `validToCol` is the next row's
    * start, the last stays open. New keys insert their first version;
    * already-closed rows are never touched. The result is a pure
    * function of (history, changes) — ties between distinct change
    * tuples at one instant order by the attribute tuple itself, so
    * arrival order never matters. A change at the exact instant an
    * open row began yields a zero-width span for the superseded
    * version (recorded, not lost). Contract: change times must be ≥
    * their key's current `validFromCol` (the CDC in-order posture);
    * with `validateInOrder = false` earlier strays interleave before
    * the open row (producing spans that overlap already-closed rows —
    * a silently corrupted history), with `validateInOrder = true` the
    * first violating change fails the job with a keyed error instead.
    * The check is in-plan (a `raise_error` branch on the change rows,
    * no extra action or scan).
    *
    * Scale shape: the changed-key set broadcasts twice — untouched
    * current rows and all closed rows pass through with ZERO shuffle
    * (the [[refreshAgg]] touched-group property), and the windowed
    * sequencing rides |touched current| + |changes| rows, never the
    * dimension. Both window passes share one key-hash exchange.
    */
  def scd2Apply(history: DataFrame, changes: DataFrame, keyCol: String,
      attrCols: Seq[String], changeTsCol: String,
      validFromCol: String = "valid_from",
      validToCol: String = "valid_to",
      validateInOrder: Boolean = false): DataFrame = {
    require(attrCols.nonEmpty, "scd2Apply needs at least one attribute column")
    val outCols = (keyCol +: attrCols) :+ validFromCol :+ validToCol
    val touched = changes.select(col(keyCol)).distinct()
    val current = history.filter(col(validToCol).isNull)
    val closed = history.filter(col(validToCol).isNotNull)
      .select(outCols.map(col): _*)
    val untouched = current.join(broadcast(touched), Seq(keyCol), "left_anti")
      .select(outCols.map(col): _*)
    val attrs = attrCols.map(col)
    val candCur = current.join(broadcast(touched), Seq(keyCol), "left_semi")
      .select(col(keyCol) +: attrs :+ col(validFromCol).as("__ts")
        :+ lit(0).as("__src"): _*)
    val candChg0 = changes
      .select(col(keyCol) +: attrs :+ col(changeTsCol).as("__ts")
        :+ lit(1).as("__src"): _*)
    // in-plan contract check: each change joins its key's current
    // valid_from (the same broadcastable touched-current relation the
    // sequencing already rides) and a violating row raises with the
    // key baked into the message — zero extra actions, the error
    // surfaces when the apply executes
    val candChg = if (!validateInOrder) candChg0 else {
      val tsType = candChg0.schema("__ts").dataType
      val curFrom = current.join(broadcast(touched), Seq(keyCol), "left_semi")
        .select(col(keyCol), col(validFromCol).as("__cur_from"))
      candChg0.join(broadcast(curFrom), Seq(keyCol), "left")
        .withColumn("__ts",
          when(col("__cur_from").isNotNull && col("__ts") < col("__cur_from"),
            raise_error(concat(
              lit("scd2Apply: change earlier than current valid_from for key "),
              col(keyCol).cast("string"))).cast(tsType))
            .otherwise(col("__ts")))
        .drop("__cur_from")
    }
    val ord = Seq(col("__ts"), col("__src")) ++ attrs
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(ord: _*)
    val tup = struct(attrs: _*)
    val kept = candCur.unionByName(candChg)
      .withColumn("__prev", lag(tup, 1).over(w))
      .filter(col("__prev").isNull || !(tup <=> col("__prev")))
      .drop("__prev")
    val spans = kept
      .withColumn(validToCol, lead(col("__ts"), 1).over(w))
      .withColumnRenamed("__ts", validFromCol)
      .select(outCols.map(col): _*)
    closed.unionByName(untouched).unionByName(spans)
  }

  /** Point-in-time read of an SCD2 history: each key's row whose
    * [valid_from, valid_to) span covers `asOfTs` — one codegen'd
    * filter, no shuffle. */
  def scd2AsOf(history: DataFrame, asOfTs: Long,
      validFromCol: String = "valid_from",
      validToCol: String = "valid_to"): DataFrame =
    history.filter(col(validFromCol) <= lit(asOfTs) &&
      (col(validToCol).isNull || col(validToCol) > lit(asOfTs)))

  private val VerCol = "__graft_ver"
  private val DelCol = "__graft_del"

  /** Merge-on-read change log — the continuously-maintained-snapshot
    * layout without a table format: `dir/base` holds the last
    * compacted snapshot, `dir/log` accumulates APPEND-ONLY change
    * batches (each write is one new parquet file set; nothing is
    * rewritten on ingest, so a streaming `foreachBatch` can call
    * [[appendChanges]] per micro-batch), and readers resolve
    * base ⊎ log latest-wins at scan time ([[readSnapshot]]). When the
    * log grows past taste, [[compactSnapshot]] folds it into a fresh
    * base — the LSM shape, with the swap left to the caller's atomic
    * rename (the [[Layout.compactDir]] contract).
    *
    * `version` must be strictly increasing across batches (the
    * batchId of a streaming sink, a ScaleData-style epoch — any
    * monotone long): two batches sharing a version have no defined
    * order between their changes to the same key beyond the
    * tombstone-on-tie rule.
    */
  def appendChanges(changes: DataFrame, dir: String, version: Long,
      deleteCol: Option[String] = None): Unit = {
    val norm = changes
      .withColumn(DelCol,
        deleteCol.map(d => coalesce(col(d), lit(false))).getOrElse(lit(false)))
      .withColumn(VerCol, lit(version))
    deleteCol.fold(norm)(d => norm.drop(d))
      .write.mode("append").parquet(s"$dir/log")
  }

  /** Resolve the current snapshot: base rows superseded by any logged
    * change drop out, the latest change per key wins (tombstones
    * delete). Without a base (a log-only dir) the log alone resolves.
    * This is a PLAN, not a copy — scans prune columns/filters into
    * both parquet legs as usual.
    */
  def readSnapshot(spark: org.apache.spark.sql.SparkSession, dir: String,
      keyCol: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val hasBase = fs.exists(new org.apache.hadoop.fs.Path(s"$dir/base"))
    val hasLog = fs.exists(new org.apache.hadoop.fs.Path(s"$dir/log"))
    require(hasBase || hasLog, s"readSnapshot: neither $dir/base nor $dir/log exists")
    if (!hasLog) return spark.read.parquet(s"$dir/base")
    val log = spark.read.parquet(s"$dir/log")
    val base =
      if (hasBase) spark.read.parquet(s"$dir/base")
      else log.drop(VerCol, DelCol).filter(lit(false))
    upsertLatest(base, log, keyCol, VerCol, Some(DelCol))
  }

  /** Streaming CDC ingestion: append each micro-batch to the change
    * log with its batchId as the version (monotone by construction).
    * Recovery replays re-append a batch under the SAME version with
    * identical content, and latest-wins resolution collapses the
    * duplicates to the same snapshot — replay-idempotent in effect,
    * provided the batch derivation is deterministic (the planner
    * replays the same source offsets).
    */
  def upsertStream(changes: DataFrame, dir: String, keyCol: String,
      deleteCol: Option[String] = None,
      checkpoint: Option[String] = None,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(changes.isStreaming, "upsertStream: changes must be a streaming DataFrame")
    val w0 = changes.writeStream.trigger(trigger)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          appendChanges(batch.toDF(), dir, batchId, deleteCol)
          ()
      }
    checkpoint.fold(w0)(c => w0.option("checkpointLocation", c)).start()
  }

  /** Incrementally maintain a GROUPED AGGREGATE under a change batch —
    * the materialized-rollup companion to [[upsert]]: given the
    * aggregate over the previous snapshot (`prevAgg`), the previous
    * snapshot itself, and a key-unique change batch, produce the
    * aggregate over the NEW snapshot by recomputing ONLY the touched
    * groups. Touched = the groups change rows land in (their new group
    * values) ∪ the groups changed keys leave (their old group values
    * from `base` — a replacement can MOVE a row between groups, and
    * both sides must refresh). Untouched groups pass through from
    * `prevAgg` by identity; a group whose last row was deleted
    * disappears, exactly as a full recompute would drop it.
    *
    * `aggs` are recomputed from the new snapshot's rows within touched
    * groups, so ANY aggregate is maintainable — min/max/count-distinct
    * included, not just the mergeable ones. The price is one scan of
    * the snapshot filtered to touched groups; the win over a full
    * recompute is the SHUFFLE: only touched-group rows enter the
    * aggregation exchange, and `prevAgg` (group-cardinality-sized)
    * never re-aggregates. With a group-partitioned or z-ordered base
    * layout ([[Layout]]) the semi-join prunes the scan itself via
    * dynamic partition pruning; the touched-group relation is
    * change-batch-bounded and broadcasts.
    *
    * `prevAgg`'s schema must be `groupCols ++ aggs` aliases (i.e. the
    * output of the same groupBy/agg over the previous snapshot — the
    * self-consistency a maintained rollup carries by construction).
    */
  def refreshAgg(prevAgg: DataFrame, base: DataFrame, changes: DataFrame,
      keyCol: String, groupCols: Seq[String], aggs: Seq[Column],
      deleteCol: Option[String] = None): DataFrame = {
    require(groupCols.nonEmpty, "refreshAgg: no group columns")
    require(aggs.nonEmpty, "refreshAgg: no aggregates")
    val gcols = groupCols.map(col)
    val changedKeys = changes.select(col(keyCol)).distinct()
    // upsert's semantics, inlined to reuse changedKeys (the operator
    // would otherwise plan the same distinct over the change batch twice)
    val keep = deleteCol
      .map(d => changes.filter(!coalesce(col(d), lit(false))).drop(d))
      .getOrElse(changes)
    val snap = base.join(changedKeys, Seq(keyCol), "left_anti").unionByName(keep)
    val arrive = keep.select(gcols: _*)
    val depart = base.join(changedKeys, Seq(keyCol), "left_semi")
      .select(gcols: _*)
    // NULL is a legal group value: all membership tests against the
    // touched set are null-safe (<=>), or a touched NULL group would
    // neither recompute (semi) nor displace its stale row (anti)
    val touched = arrive.unionByName(depart).distinct()
      .toDF(groupCols.map(g => s"__t_$g"): _*)
    def touchedCond(d: DataFrame): Column =
      groupCols.map(g => d(g) <=> touched(s"__t_$g")).reduce(_ && _)
    val fresh = snap.join(touched, touchedCond(snap), "left_semi")
      .groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
    prevAgg.join(touched, touchedCond(prevAgg), "left_anti").unionByName(fresh)
  }

  /** Delta-maintained rollup for MERGEABLE aggregates (count + sums) —
    * the incremental-view-maintenance shape, and the one that actually
    * wins at scale: [[refreshAgg]] recomputes touched groups from the
    * snapshot (any aggregate, but a second base pass + an aggregation
    * exchange over touched rows); this variant never re-aggregates ANY
    * base rows wholesale. Departing rows (base rows whose key is in the
    * change batch) enter with weight −1, arriving rows (non-delete
    * changes) with +1; one change-batch-bounded aggregate produces the
    * per-group deltas, and the new rollup is `prevAgg ⟗ delta` with
    * count/sum columns added (groups whose count reaches 0 drop, new
    * groups appear). Cost: ONE base scan semi-filtered by the
    * broadcast changed-key set, one tiny delta exchange, one
    * group-cardinality-sized merge join — no corpus-wide aggregation
    * exchange, which is the term that dominates a 100 TB full
    * recompute.
    *
    * Exactness: the merge is only correct for aggregates where
    * add/subtract round-trips — counts, integer sums, DECIMAL sums.
    * Each summed column is computed in the dtype of `prevAgg`'s
    * matching column, which for decimals is exact; refuse double sums
    * upstream (subtraction re-orders the float reduction). min/max are
    * not delta-maintainable (a deleted extremum needs a group rescan):
    * use [[refreshAgg]] for those. NULL semantics: prev+delta equals
    * the full recompute's sum whenever the group retains at least one
    * non-null value (nulls never enter either side's sum), and an
    * all-null-values group stays NULL; the one undetectable edge is a
    * group whose LAST non-null value departs while null-valued rows
    * remain — delta arithmetic reads 0 where a recompute reads NULL.
    * If your value columns are nullable and that distinction matters,
    * use [[refreshAgg]].
    *
    * `prevAgg` schema: `groupCols ++ countAlias ++ sums.map(_._2)`.
    */
  def refreshAggDelta(prevAgg: DataFrame, base: DataFrame, changes: DataFrame,
      keyCol: String, groupCols: Seq[String], sums: Seq[(String, String)],
      countAlias: String = "n", deleteCol: Option[String] = None): DataFrame = {
    require(groupCols.nonEmpty, "refreshAggDelta: no group columns")
    val prevTypes = prevAgg.schema.fields.map(f => f.name -> f.dataType).toMap
    sums.foreach { case (_, alias) =>
      val dt = prevTypes.getOrElse(alias,
        throw new IllegalArgumentException(s"refreshAggDelta: prevAgg lacks '$alias'"))
      require(!dt.isInstanceOf[org.apache.spark.sql.types.DoubleType] &&
        !dt.isInstanceOf[org.apache.spark.sql.types.FloatType],
        s"refreshAggDelta: '$alias' is $dt — float sums don't subtract exactly; " +
          "carry the rollup in decimal/integer")
    }
    val gcols = groupCols.map(col)
    val changedKeys = changes.select(col(keyCol)).distinct()
    val departures = base.join(changedKeys, Seq(keyCol), "left_semi")
      .select(gcols ++ sums.map { case (c, a) => col(c).as(a) }: _*)
    val arrivals = deleteCol
      .map(d => changes.filter(!coalesce(col(d), lit(false))))
      .getOrElse(changes)
      .select(gcols ++ sums.map { case (c, a) => col(c).as(a) }: _*)
    mergeDeltas(prevAgg, arrivals, departures, groupCols,
      sums.map(_._2), countAlias)
  }

  /** The ± merge at the core of [[refreshAggDelta]], factored for CDC
    * streams that carry BEFORE-IMAGES (Debezium-style): when the
    * change feed already contains each update/delete's old row,
    * `departures` is those before-images and NO base scan is needed
    * at all — the rollup maintains itself from the feed alone, which
    * is what makes [[rollupStream]] a pure per-batch merge. Both
    * inputs are `groupCols ++ aliases`-shaped row sets (each row one
    * corpus row's contribution); the same exactness and NULL rules as
    * [[refreshAggDelta]] apply.
    */
  def mergeDeltas(prevAgg: DataFrame, arrivals: DataFrame,
      departures: DataFrame, groupCols: Seq[String], sumAliases: Seq[String],
      countAlias: String = "n"): DataFrame = {
    require(groupCols.nonEmpty, "mergeDeltas: no group columns")
    val prevTypes = prevAgg.schema.fields.map(f => f.name -> f.dataType).toMap
    sumAliases.foreach { alias =>
      val dt = prevTypes.getOrElse(alias,
        throw new IllegalArgumentException(s"mergeDeltas: prevAgg lacks '$alias'"))
      require(!dt.isInstanceOf[org.apache.spark.sql.types.DoubleType] &&
        !dt.isInstanceOf[org.apache.spark.sql.types.FloatType],
        s"mergeDeltas: '$alias' is $dt — float sums don't subtract exactly; " +
          "carry the rollup in decimal/integer")
    }
    val gcols = groupCols.map(col)
    def side(df: DataFrame, w: Long): DataFrame =
      df.select(gcols ++ sumAliases.map(col) :+ lit(w).as("__w"): _*)
    val delta = side(departures, -1L).unionByName(side(arrivals, 1L))
      .groupBy(gcols: _*)
      .agg(sum(col("__w")).as("__dn"),
        sumAliases.map { a =>
          sum((col(a) * col("__w")).cast(prevTypes(a))).as(s"__d_$a") }: _*)
      // NULL is a legal group value: the prev⟗delta merge must match
      // NULL groups (a plain equi full-outer would emit the prev row
      // stale AND the delta row as a second NULL group)
      .toDF(groupCols.map(g => s"__g_$g") ++ Seq("__dn") ++
        sumAliases.map(a => s"__d_$a"): _*)
    val cond = groupCols.map(g => prevAgg(g) <=> delta(s"__g_$g")).reduce(_ && _)
    val merged = prevAgg.join(delta, cond, "full_outer")
      .select(groupCols.map(g =>
          when(col("__dn").isNotNull, col(s"__g_$g")).otherwise(col(g)).as(g)) ++
        Seq((coalesce(col(countAlias), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as(countAlias)) ++
        sumAliases.map { a =>
          // both sides null → null (an all-null-values group stays
          // NULL, matching the full recompute); one side null → the
          // other carries the exact sum
          when(col(a).isNull && col(s"__d_$a").isNull,
              lit(null).cast(prevTypes(a)))
            .otherwise((coalesce(col(a), lit(0).cast(prevTypes(a))) +
              coalesce(col(s"__d_$a"), lit(0).cast(prevTypes(a))))
              .cast(prevTypes(a))).as(a) }: _*)
    merged.filter(col(countAlias) > 0L)
  }

  /** Persist a rollup snapshot at an explicit version (`dir/v=N`). */
  def writeRollup(agg: DataFrame, dir: String, version: Long): Unit =
    agg.write.mode("overwrite").parquet(s"$dir/v=$version")

  // only well-formed `v=<digits>` entries are snapshots — stray temp /
  // partial dirs (e.g. a crashed writer's `v=3.__tmp`) must neither
  // kill the stream with NumberFormatException nor be pruned
  private val SnapshotDir = "v=(\\d+)".r
  private def snapshotVersion(name: String): Option[Long] = name match {
    case SnapshotDir(d) => Some(d.toLong)
    case _ => None
  }

  /** Read the LATEST persisted rollup version → (rollup, version). */
  def readRollup(spark: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, Long) = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val versions = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).flatMap(snapshotVersion)
    require(versions.nonEmpty, s"readRollup: no v=N snapshots under $dir")
    val v = versions.max
    (spark.read.parquet(s"$dir/v=$v"), v)
  }

  /** Continuously-maintained rollup from a CDC stream WITH
    * BEFORE-IMAGES (Debezium shape): each row carries `opCol` ∈
    * {"I","U","D"}, the new values in the plain `groupCols`/
    * `sumAliases` columns (I/U), and the old values under
    * `oldPrefix`-prefixed names (U/D). Because the feed carries the
    * departures itself, NO base snapshot is scanned — each micro-batch
    * is one [[mergeDeltas]] against the rollup (group-cardinality
    * work, zero corpus scans), which is what a per-key metrics rollup
    * over a 100 TB corpus's change feed has to look like.
    *
    * Recovery contract: batch `bid` reads snapshot `v=bid` and writes
    * `v=bid+1` — a pure function of (prior snapshot, batch), so a
    * replayed batch OVERWRITES its own output identically instead of
    * double-applying (the latest-wins-analogue for arithmetic state).
    * Seed `v=0` with [[writeRollup]] before starting (an empty
    * aggregate of the right schema, or the rollup of an existing
    * corpus). Superseded snapshots older than the batch's input are
    * pruned after each commit.
    */
  def rollupStream(changes: DataFrame, dir: String, groupCols: Seq[String],
      sumAliases: Seq[String], countAlias: String = "n",
      opCol: String = "op", oldPrefix: String = "old_",
      checkpoint: Option[String] = None,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(changes.isStreaming, "rollupStream: changes must be a streaming DataFrame")
    val w0 = changes.writeStream.trigger(trigger)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
          val spark = batch.sparkSession
          val fs = new org.apache.hadoop.fs.Path(dir)
            .getFileSystem(spark.sessionState.newHadoopConf())
          require(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v=$bid")),
            s"rollupStream: missing rollup snapshot v=$bid under $dir " +
              "(seed v=0 with writeRollup before starting)")
          val prev = spark.read.parquet(s"$dir/v=$bid")
          val b = batch.toDF()
          val arrivals = b.filter(col(opCol).isin("I", "U"))
            .select((groupCols ++ sumAliases).map(col): _*)
          val departures = b.filter(col(opCol).isin("U", "D"))
            .select((groupCols ++ sumAliases).map(c => col(oldPrefix + c).as(c)): _*)
          writeRollup(
            mergeDeltas(prev, arrivals, departures, groupCols, sumAliases, countAlias),
            dir, bid + 1)
          // prune snapshots this batch's commit superseded (< bid:
          // v=bid itself stays — it is THIS batch's replay input)
          fs.listStatus(new org.apache.hadoop.fs.Path(dir))
            .map(_.getPath)
            .filter(p => snapshotVersion(p.getName).exists(_ < bid))
            .foreach(p => fs.delete(p, true))
          ()
      }
    checkpoint.fold(w0)(c => w0.option("checkpointLocation", c)).start()
  }

  /** Streaming SCD2 maintenance: each micro-batch of timestamped
    * attribute changes folds into the versioned history via
    * [[scd2Apply]] — batch `bid` reads snapshot `v=bid`, writes
    * `v=bid+1` (the [[rollupStream]] replay-idempotency contract: a
    * replayed batch overwrites its own output instead of
    * double-applying, because the result is a pure function of
    * (snapshot, batch)). Seed `v=0` with the initial history via
    * [[writeRollup]]; superseded snapshots prune per commit. The
    * per-entity in-order posture is [[scd2Apply]]'s own contract
    * (change times ≥ the key's current valid_from).
    */
  def scd2Stream(changes: DataFrame, dir: String, keyCol: String,
      attrCols: Seq[String], changeTsCol: String,
      checkpoint: Option[String] = None,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(changes.isStreaming, "scd2Stream: changes must be a streaming DataFrame")
    val w0 = changes.writeStream.trigger(trigger)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
          val spark = batch.sparkSession
          val fs = new org.apache.hadoop.fs.Path(dir)
            .getFileSystem(spark.sessionState.newHadoopConf())
          require(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v=$bid")),
            s"scd2Stream: missing history snapshot v=$bid under $dir " +
              "(seed v=0 with writeRollup before starting)")
          val prev = spark.read.parquet(s"$dir/v=$bid")
          writeRollup(
            scd2Apply(prev, batch.toDF(), keyCol, attrCols, changeTsCol),
            dir, bid + 1)
          fs.listStatus(new org.apache.hadoop.fs.Path(dir))
            .map(_.getPath)
            .filter(p => snapshotVersion(p.getName).exists(_ < bid))
            .foreach(p => fs.delete(p, true))
          ()
      }
    checkpoint.fold(w0)(c => w0.option("checkpointLocation", c)).start()
  }

  /** Fold the log into a fresh compacted base at `outDir/base` (the
    * resolved snapshot, no metadata columns). The caller swaps
    * `outDir` for `dir` atomically and drops the old log — compaction
    * never mutates the live layout, so readers racing a compaction
    * keep resolving the old base ⊎ log consistently.
    */
  def compactSnapshot(spark: org.apache.spark.sql.SparkSession, dir: String,
      keyCol: String, outDir: String): Unit = {
    require(new org.apache.hadoop.fs.Path(dir) !=
      new org.apache.hadoop.fs.Path(outDir), "compactSnapshot: outDir must differ")
    readSnapshot(spark, dir, keyCol).write.mode("overwrite").parquet(s"$outDir/base")
  }

  /** Atomic snapshot swap — the committed half of the "caller swaps"
    * contract in [[compactSnapshot]] / [[Layout.compactDir]] /
    * [[Search.compactIndex]]: versions live side-by-side under one
    * root and a single `_current` POINTER FILE names the live one.
    * Writers publish a fully-written version dir with ONE atomic
    * pointer flip; readers resolve through the pointer and then hold
    * a stable file listing — a reader racing a commit sees the old
    * version or the new one, never a mix, and keeps reading its
    * resolved files until [[vacuumSnapshots]] reclaims them after a
    * grace period.
    *
    * The flip is `FileContext.rename(tmp, _current, OVERWRITE)` —
    * atomic on HDFS and POSIX filesystems. On S3-style object stores
    * rename is copy+delete, but the manifest is a single small
    * object, and a single-object overwrite PUT is itself atomic-read
    * (readers see the old or the new body, never a torn one) — the
    * same reasoning every manifest-pointer table format rests on.
    *
    * SLOW-WRITER SAFETY: write new versions to [[stageSnapshotPath]]
    * (an underscore-prefixed dir [[vacuumSnapshots]] never touches)
    * — commitSnapshot then renames the staged dir to its final name
    * immediately before the pointer flip, so an unprefixed version
    * dir exists uncommitted only for the instant between the two
    * renames, never for the whole (unbounded) write. Committing a
    * directly-written unprefixed dir still works, but then a
    * concurrent [[vacuumSnapshots]] can reclaim it if the write-to-
    * commit gap exceeds the grace window — the staging protocol is
    * the concurrent-maintenance form.
    */
  def commitSnapshot(spark: org.apache.spark.sql.SparkSession,
      rootDir: String, snapshot: String): Unit = {
    require(snapshot.nonEmpty && !snapshot.startsWith("_") &&
      !snapshot.contains(".."),
      s"commitSnapshot: bad snapshot name '$snapshot'")
    val root = new org.apache.hadoop.fs.Path(rootDir)
    val hc = spark.sessionState.newHadoopConf()
    val fs = root.getFileSystem(hc)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(root.toUri, hc)
    val fin = new org.apache.hadoop.fs.Path(root, snapshot)
    val staged = new org.apache.hadoop.fs.Path(root, s"_stage-$snapshot")
    if (fs.exists(staged) && !fs.exists(fin))
      fc.rename(staged, fin)
    require(fs.exists(fin),
      s"commitSnapshot: '$snapshot' does not exist under $rootDir — " +
        "write the version dir (ideally to stageSnapshotPath) fully " +
        "BEFORE committing the pointer")
    val tmp = new org.apache.hadoop.fs.Path(root,
      s"_current.tmp-${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, true)
    try out.write(snapshot.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fc.rename(tmp, new org.apache.hadoop.fs.Path(root, "_current"),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Where a writer should STAGE version `snapshot` before
    * [[commitSnapshot]]: an underscore-prefixed sibling that
    * [[vacuumSnapshots]] is contractually blind to, so an
    * arbitrarily slow write can never race a vacuum. commitSnapshot
    * renames it into place.
    */
  def stageSnapshotPath(rootDir: String, snapshot: String): String = {
    require(snapshot.nonEmpty && !snapshot.startsWith("_") &&
      !snapshot.contains(".."),
      s"stageSnapshotPath: bad snapshot name '$snapshot'")
    s"$rootDir/_stage-$snapshot"
  }

  /** Resolve the live snapshot path under `rootDir` via the
    * `_current` pointer — None before the first [[commitSnapshot]].
    */
  def resolveSnapshot(spark: org.apache.spark.sql.SparkSession,
      rootDir: String): Option[String] = {
    val root = new org.apache.hadoop.fs.Path(rootDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val cur = new org.apache.hadoop.fs.Path(root, "_current")
    if (!fs.exists(cur)) None
    else {
      val in = fs.open(cur)
      try {
        val bytes = org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
        Some(s"$rootDir/${new String(bytes, java.nio.charset.StandardCharsets.UTF_8).trim}")
      } finally in.close()
    }
  }

  /** Read the committed snapshot. Fails fast when no commit exists —
    * an uncommitted root is a setup error, not an empty table.
    */
  def readCurrent(spark: org.apache.spark.sql.SparkSession,
      rootDir: String): DataFrame = {
    val p = resolveSnapshot(spark, rootDir)
    require(p.isDefined, s"readCurrent: no _current pointer under $rootDir")
    spark.read.parquet(p.get)
  }

  /** Reclaim superseded version dirs under `rootDir`: every
    * non-underscore entry that is NOT the committed snapshot and
    * whose modification time is older than `graceMs` is deleted. The
    * grace window is the race guard for READERS — one that resolved
    * the pointer just before a commit keeps its files until its
    * listing-age exceeds the grace (size it to the longest expected
    * read job). WRITERS are guarded by the staging protocol instead
    * ([[stageSnapshotPath]]): a staged `_stage-*` dir is never
    * vacuumed no matter how old, so a slow write cannot lose a race
    * (an unprefixed dir written directly is only safe if committed
    * within the grace). Orphaned `_current.tmp-*` pointer FILES (a
    * writer that crashed between staging the pointer and the rename)
    * are also reclaimed once older than the grace — they are
    * never-referenced single-digit-byte files, safe to drop on age
    * alone. Returns the deleted entry names.
    */
  def vacuumSnapshots(spark: org.apache.spark.sql.SparkSession,
      rootDir: String, graceMs: Long): Seq[String] = {
    require(graceMs >= 0, "graceMs must be >= 0")
    val root = new org.apache.hadoop.fs.Path(rootDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val current = resolveSnapshot(spark, rootDir)
      .map(p => new org.apache.hadoop.fs.Path(p).getName).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    fs.listStatus(root).toSeq
      .filter { st =>
        val name = st.getPath.getName
        val staleVersion = st.isDirectory && !name.startsWith("_") &&
          !current.contains(name) && st.getModificationTime < cutoff
        val orphanTmp = !st.isDirectory && name.startsWith("_current.tmp-") &&
          st.getModificationTime < cutoff
        staleVersion || orphanTmp
      }
      .map { st => fs.delete(st.getPath, true); st.getPath.getName }
  }
}
