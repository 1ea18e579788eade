package graft

import org.apache.spark.sql.functions.{count, lit, sum, when}
import graft.functions.Maintain

/** CDC apply semantics: replace/insert/delete in one pass, versioned
  * batches resolve to the latest change per key, tombstone-on-tie.
  */
class MaintainSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "v")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select($"k", $"v").as[(Long, String)].collect().sortBy(_._1).toSeq

  test("upsert: replace, insert, tombstone delete, and delete-of-absent-key") {
    val changes = Seq(
      (2L, "two'", false),  // replace
      (4L, "four", false),  // insert
      (3L, "ignored", true), // delete
      (9L, "ignored", true)  // delete of a key base never had -> no-op
    ).toDF("k", "v", "del")
    assert(rows(Maintain.upsert(base, changes, "k", Some("del"))) ===
      Seq((1L, "one"), (2L, "two'"), (4L, "four")))
  }

  test("upsert without a delete column is pure replace/insert") {
    val changes = Seq((1L, "uno"), (5L, "five")).toDF("k", "v")
    assert(rows(Maintain.upsert(base, changes, "k")) ===
      Seq((1L, "uno"), (2L, "two"), (3L, "three"), (5L, "five")))
  }

  test("null delete flags read as false (the row upserts)") {
    val changes = Seq((1L, "uno", null.asInstanceOf[java.lang.Boolean]))
      .toDF("k", "v", "del")
    assert(rows(Maintain.upsert(base, changes, "k", Some("del")))
      .contains((1L, "uno")))
  }

  test("upsertLatest: greatest version wins; a winning tombstone deletes despite older re-inserts") {
    val changes = Seq(
      (1L, "v1", 1L, false), (1L, "v3", 3L, false), (1L, "v2", 2L, false),
      (2L, "re-added", 5L, false), (2L, "x", 7L, true), // tombstone is latest
      (4L, "inserted", 1L, false)
    ).toDF("k", "v", "ver", "del")
    assert(rows(Maintain.upsertLatest(base, changes, "k", "ver", Some("del"))) ===
      Seq((1L, "v3"), (3L, "three"), (4L, "inserted")))
  }

  test("merge-on-read log: append-only batches resolve latest-wins; compaction is read-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mor").toString
    // seed a base
    base.write.parquet(s"$dir/base")
    // batch 1: replace k=1, insert k=4; batch 2: delete k=4, replace k=2
    Maintain.appendChanges(Seq((1L, "one'", false), (4L, "four", false))
      .toDF("k", "v", "del"), dir, version = 1L, deleteCol = Some("del"))
    Maintain.appendChanges(Seq((4L, "x", true), (2L, "two'", false))
      .toDF("k", "v", "del"), dir, version = 2L, deleteCol = Some("del"))
    val resolved = rows(Maintain.readSnapshot(spark, dir, "k"))
    assert(resolved === Seq((1L, "one'"), (2L, "two'"), (3L, "three")))
    // metadata columns never leak into the resolved snapshot
    assert(Maintain.readSnapshot(spark, dir, "k").columns.toSeq === Seq("k", "v"))
    // compaction folds base + log into a fresh base, read-identical
    Maintain.compactSnapshot(spark, dir, "k", s"$dir-compacted")
    assert(rows(Maintain.readSnapshot(spark, s"$dir-compacted", "k")) === resolved)
    // post-compaction appends keep resolving against the new base
    Maintain.appendChanges(Seq((3L, "three'", false)).toDF("k", "v", "del"),
      s"$dir-compacted", version = 3L, deleteCol = Some("del"))
    assert(rows(Maintain.readSnapshot(spark, s"$dir-compacted", "k")) ===
      Seq((1L, "one'"), (2L, "two'"), (3L, "three'")))
  }

  test("readSnapshot's anti-join broadcasts (the base never shuffles for a small log)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mor-plan").toString
    Tables.load(spark, sf001, "documents").select($"doc_id", $"text")
      .write.parquet(s"$dir/base")
    Maintain.appendChanges(
      Seq((1L, "changed")).toDF("doc_id", "text"), dir, version = 1L)
    val plan = Maintain.readSnapshot(spark, dir, "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
  }

  test("merge-on-read log without a base: the log alone resolves") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mor-nobase").toString
    Maintain.appendChanges(Seq((7L, "seven")).toDF("k", "v"), dir, version = 1L)
    Maintain.appendChanges(Seq((7L, "seven'"), (8L, "eight")).toDF("k", "v"),
      dir, version = 2L)
    assert(rows(Maintain.readSnapshot(spark, dir, "k")) ===
      Seq((7L, "seven'"), (8L, "eight")))
    val e = intercept[IllegalArgumentException] {
      Maintain.readSnapshot(spark, "/tmp/graft-definitely-missing-dir", "k")
    }
    assert(e.getMessage.contains("neither"))
  }

  test("streaming CDC ingestion: micro-batches land in the log, snapshot resolves latest-wins") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft-mor-stream").toString
    base.write.parquet(s"$dir/base")
    val src = graft.connectors.Testing.testingSource[(Long, String, Boolean)](spark)
    val q = Maintain.upsertStream(src.toDS().toDF("k", "v", "del"),
      dir, "k", deleteCol = Some("del"), trigger = Trigger.ProcessingTime(0))
    try {
      src.addBatch((1L, "one'", false), (4L, "four", false))
      q.processAllAvailable()
      src.addBatch((4L, "x", true), (2L, "two'", false))
      q.processAllAvailable()
    } finally q.stop()
    assert(rows(Maintain.readSnapshot(spark, dir, "k")) ===
      Seq((1L, "one'"), (2L, "two'"), (3L, "three")))
  }

  test("upsertLatest version tie prefers the tombstone (arrival-order independent)") {
    val a = Seq((1L, "up", 5L, false), (1L, "x", 5L, true)).toDF("k", "v", "ver", "del")
    val b = Seq((1L, "x", 5L, true), (1L, "up", 5L, false)).toDF("k", "v", "ver", "del")
    for (ch <- Seq(a, b)) {
      assert(rows(Maintain.upsertLatest(base, ch, "k", "ver", Some("del"))) ===
        Seq((2L, "two"), (3L, "three")))
    }
  }

  // ---- refreshAgg: incremental rollup maintenance ----

  // groups: g1 = {k1, k2}, g2 = {k3}, g3 = {k4}, g4 = {k5} (untouched)
  private def aggBase = Seq(
    (1L, "g1", 10L), (2L, "g1", 20L), (3L, "g2", 30L),
    (4L, "g3", 40L), (5L, "g4", 50L)).toDF("k", "g", "v")
  private def aggCols = Seq(
    org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)).as("n"),
    org.apache.spark.sql.functions.sum($"v").as("s"),
    org.apache.spark.sql.functions.max($"v").as("mx"))

  test("refreshAgg ≡ full recompute: group move, group vanish, new group, untouched") {
    // k1 MOVES g1→g2 (both refresh), k3's replacement stays in g2,
    // k4 deleted → g3 VANISHES, k9 inserts NEW group g9
    val changes = Seq(
      (1L, "g2", 11L, false), (3L, "g2", 31L, false),
      (4L, "g3", 0L, true), (9L, "g9", 90L, false))
      .toDF("k", "g", "v", "del")
    val prev = aggBase.groupBy($"g").agg(aggCols.head, aggCols.tail: _*)
    val got = Maintain.refreshAgg(prev, aggBase, changes, "k", Seq("g"), aggCols, Some("del"))
      .select($"g", $"n", $"s", $"mx").as[(String, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    val full = Maintain.upsert(aggBase, changes, "k", Some("del"))
      .groupBy($"g").agg(aggCols.head, aggCols.tail: _*)
      .select($"g", $"n", $"s", $"mx").as[(String, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got === full)
    // g2 = moved k1 (11) + replaced k3 (31); k3's old row is superseded
    assert(got === Seq(("g1", 1L, 20L, 20L), ("g2", 2L, 11L + 31L, 31L),
      ("g4", 1L, 50L, 50L), ("g9", 1L, 90L, 90L)))
  }

  test("refreshAggDelta ≡ full recompute: move/vanish/new/untouched, exact decimal sums") {
    val base = aggBase.withColumn("v", $"v".cast("decimal(12,2)"))
    val changes = Seq(
      (1L, "g2", 11L, false), (3L, "g2", 31L, false),
      (4L, "g3", 0L, true), (9L, "g9", 90L, false))
      .toDF("k", "g", "v", "del").withColumn("v", $"v".cast("decimal(12,2)"))
    val prev = base.groupBy($"g")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val got = Maintain.refreshAggDelta(prev, base, changes, "k", Seq("g"),
        Seq(("v", "s")), "n", Some("del"))
      .select($"g", $"n", $"s".cast("long")).as[(String, Long, Long)]
      .collect().sortBy(_._1).toSeq
    val full = Maintain.upsert(base, changes, "k", Some("del"))
      .groupBy($"g").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .select($"g", $"n", $"s".cast("long")).as[(String, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got === full)
    // g3 vanished (its only row deleted); g9 is delta-only (new group)
    assert(!got.exists(_._1 == "g3"))
    assert(got.exists(_._1 == "g9"))
    // untouched g4 carried through
    assert(got.find(_._1 == "g4").get === (("g4", 1L, 50L)))
  }

  test("refreshAggDelta refuses float rollup columns (subtraction would drift)") {
    val base = aggBase.withColumn("v", $"v".cast("double"))
    val prev = base.groupBy($"g").agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val ex = intercept[IllegalArgumentException] {
      Maintain.refreshAggDelta(prev, base,
        Seq((1L, "g1", 1.0, false)).toDF("k", "g", "v", "del"),
        "k", Seq("g"), Seq(("v", "s")), "n", Some("del"))
    }
    assert(ex.getMessage.contains("float sums"))
  }

  test("refreshAgg + refreshAggDelta: NULL is a legal group value (null-safe membership)") {
    // k1 lives in the NULL group; k2 in g1; change replaces k1 in-place
    val base = Seq((1L, Option.empty[String], 10L), (2L, Option("g1"), 20L))
      .toDF("k", "g", "v").withColumn("v", $"v".cast("decimal(12,2)"))
    val changes = Seq((1L, Option.empty[String], 11L, false))
      .toDF("k", "g", "v", "del").withColumn("v", $"v".cast("decimal(12,2)"))
    val prev = base.groupBy($"g").agg(count(lit(1)).as("n"), sum($"v").as("s"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"g", $"n", $"s".cast("long")).as[(Option[String], Long, Long)]
        .collect().sortBy(_._1).toSeq
    val full = rows(Maintain.upsert(base, changes, "k", Some("del"))
      .groupBy($"g").agg(count(lit(1)).as("n"), sum($"v").as("s")))
    assert(full === Seq((None, 1L, 11L), (Some("g1"), 1L, 20L)))
    val inc = rows(Maintain.refreshAgg(prev, base, changes, "k", Seq("g"),
      Seq(count(lit(1)).as("n"), sum($"v").as("s")), Some("del")))
    assert(inc === full) // the stale NULL-group row must NOT survive
    val delta = rows(Maintain.refreshAggDelta(prev, base, changes, "k",
      Seq("g"), Seq(("v", "s")), "n", Some("del")))
    assert(delta === full) // and the delta merge must not emit two NULL rows
  }

  test("refreshAggDelta: an all-null-values group keeps a NULL sum (untouched and touched)") {
    val base = Seq(
      (1L, "g1", Option.empty[Long]),
      (2L, "g2", Option(5L))).toDF("k", "g", "v")
      .withColumn("v", $"v".cast("decimal(12,2)"))
    val changes = Seq((2L, "g2", Option(7L), false)).toDF("k", "g", "v", "del")
      .withColumn("v", $"v".cast("decimal(12,2)"))
    val prev = base.groupBy($"g").agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val got = Maintain.refreshAggDelta(prev, base, changes, "k", Seq("g"),
        Seq(("v", "s")), "n", Some("del"))
      .select($"g", $"s").collect().map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(got("g1")) // untouched all-null group: NULL, not coalesced to 0
    assert(!got("g2"))
  }

  test("rollupStream: CDC before-image stream maintains the rollup; replay is idempotent") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft-rollup").toString
    // seed: rollup over an initial corpus {k1:(g1,10), k2:(g2,20)}
    val seed = Seq(("g1", 1L, 10L), ("g2", 1L, 20L)).toDF("g", "n", "v")
      .withColumn("v", $"v".cast("decimal(12,2)"))
    Maintain.writeRollup(seed, dir, 0L)

    val src = graft.connectors.Testing
      .testingSource[(String, String, Option[Long], Option[String], Option[Long])](spark)
    val stream = src.toDS().toDF("op", "g", "v", "old_g", "old_v")
      .select($"op", $"g", $"v".cast("decimal(12,2)").as("v"),
        $"old_g", $"old_v".cast("decimal(12,2)").as("old_v"))
    val q = Maintain.rollupStream(stream, dir, Seq("g"), Seq("v"), "n",
      opCol = "op", oldPrefix = "old_", trigger = Trigger.ProcessingTime(0))
    try {
      // batch 0: insert k3 into g1; update k2 20→25 staying in g2
      src.addBatch(("I", "g1", Some(5L), None, None),
        ("U", "g2", Some(25L), Some("g2"), Some(20L)))
      q.processAllAvailable()
      // batch 1: move k1 g1→g2 (U with group change); delete k3
      src.addBatch(("U", "g2", Some(11L), Some("g1"), Some(10L)),
        ("D", "", None, Some("g1"), Some(5L)))
      q.processAllAvailable()
    } finally q.stop()

    val (rollup, v) = Maintain.readRollup(spark, dir)
    assert(v === 2L)
    val got = rollup.select($"g", $"n", $"v".cast("long"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    // final rows: k1=(g2,11), k2=(g2,25) → g2 n=2 s=36; g1 empty (dropped)
    assert(got === Seq(("g2", 2L, 36L)))

    // replay idempotency: re-deriving v=2 from v=1 and batch 1's rows
    // produces the identical snapshot (pure function of (state, batch))
    val v1 = spark.read.parquet(s"$dir/v=1")
    val b1 = Seq(("U", "g2", Option(11L), Option("g1"), Option(10L)),
      ("D", "", Option.empty[Long], Option("g1"), Option(5L)))
      .toDF("op", "g", "v", "old_g", "old_v")
      .select($"op", $"g", $"v".cast("decimal(12,2)").as("v"),
        $"old_g", $"old_v".cast("decimal(12,2)").as("old_v"))
    val replayed = Maintain.mergeDeltas(v1,
        b1.filter($"op".isin("I", "U")).select($"g", $"v"),
        b1.filter($"op".isin("U", "D")).select($"old_g".as("g"), $"old_v".as("v")),
        Seq("g"), Seq("v"), "n")
      .select($"g", $"n", $"v".cast("long")).as[(String, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(replayed === got.map { case (g, n, s) => (g, n, s) })
  }

  test("rollupStream survives stop/restart without double-applying (checkpointed)") {
    import org.apache.spark.sql.streaming.Trigger
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-rollup-rec").toString
    val ckpt = Files.createTempDirectory("graft-rollup-ckpt").toString
    Maintain.writeRollup(
      Seq(("g1", 1L, 10L)).toDF("g", "n", "v")
        .withColumn("v", $"v".cast("decimal(12,2)")), dir, 0L)
    val src = graft.connectors.Testing
      .testingSource[(String, String, Option[Long], Option[String], Option[Long])](spark)
    def stream = src.toDS().toDF("op", "g", "v", "old_g", "old_v")
      .select($"op", $"g", $"v".cast("decimal(12,2)").as("v"),
        $"old_g", $"old_v".cast("decimal(12,2)").as("old_v"))
    def start() = Maintain.rollupStream(stream, dir, Seq("g"), Seq("v"), "n",
      checkpoint = Some(ckpt), trigger = Trigger.ProcessingTime(0))
    val q1 = start()
    try {
      src.addBatch(("I", "g1", Some(5L), None, None))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart from the checkpoint; feed another batch
    val q2 = start()
    try {
      src.addBatch(("U", "g1", Some(6L), Some("g1"), Some(5L)))
      q2.processAllAvailable()
    } finally q2.stop()
    val (rollup, v) = Maintain.readRollup(spark, dir)
    val got = rollup.select($"g", $"n", $"v".cast("long"))
      .as[(String, Long, Long)].collect().toSeq
    // 10 + insert 5 + (replace 5→6) = 16, n = 2; nothing applied twice
    assert(got === Seq(("g1", 2L, 16L)), s"v=$v got=$got")
  }

  test("refreshAgg reuses untouched groups BY IDENTITY (the incremental proof)") {
    // poison the untouched group g4's prior aggregate: if refreshAgg
    // recomputed it, the poison would heal — it must survive instead
    val changes = Seq((1L, "g1", 99L, false)).toDF("k", "g", "v", "del")
    val prev = aggBase.groupBy($"g").agg(aggCols.head, aggCols.tail: _*)
      .withColumn("s", when($"g" === "g4", lit(-777L)).otherwise($"s"))
    val got = Maintain.refreshAgg(prev, aggBase, changes, "k", Seq("g"), aggCols, Some("del"))
      .select($"g", $"s").as[(String, Long)].collect().toMap
    assert(got("g4") === -777L)       // passed through, not recomputed
    assert(got("g1") === 99L + 20L)   // touched group IS fresh
  }

  private def scd2Rows(df: org.apache.spark.sql.DataFrame) =
    df.select($"k", $"seg", $"valid_from", $"valid_to")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .sortBy(t => (t._1, t._3, t._2)).toSeq

  test("scd2Apply: open/close chains, no-op collapse, insert, closed pass-through") {
    val hist = Seq(
      (1L, "Z", -10L, Some(0L)),  // closed — must pass through untouched
      (1L, "A", 0L, None),        // current, will close at 10
      (2L, "B", 0L, None))        // untouched key
      .toDF("k", "seg", "valid_from", "valid_to")
    val changes = Seq(
      (1L, "A", 5L),   // no-op (same attrs) — never opens a version
      (1L, "C", 10L),  // real change
      (1L, "C", 20L),  // no-op repeat
      (3L, "N", 7L))   // brand-new key → first version inserts
      .toDF("k", "seg", "ts")
    val out = scd2Rows(Maintain.scd2Apply(hist, changes, "k", Seq("seg"), "ts"))
    assert(out === Seq(
      (1L, "Z", -10L, Some(0L)),
      (1L, "A", 0L, Some(10L)),
      (1L, "C", 10L, None),
      (2L, "B", 0L, None),
      (3L, "N", 7L, None)))
  }

  test("scd2Apply: same-instant supersede keeps a zero-width span; instant ties order by attrs") {
    val hist = Seq((1L, "A", 0L, None: Option[Long]))
      .toDF("k", "seg", "valid_from", "valid_to")
    val changes = Seq((1L, "B", 0L), (2L, "Y", 5L), (2L, "X", 5L))
      .toDF("k", "seg", "ts")
    val out = scd2Rows(Maintain.scd2Apply(hist, changes, "k", Seq("seg"), "ts"))
    // key 1: current A sorts before the change at the same instant →
    // A recorded as [0, 0), B open. key 2: two distinct changes at one
    // instant order by the attribute tuple (X before Y), arrival-order-
    // independent.
    assert(out === Seq(
      (1L, "A", 0L, Some(0L)),
      (1L, "B", 0L, None),
      (2L, "X", 5L, Some(5L)),
      (2L, "Y", 5L, None)))
  }

  test("scd2Stream: micro-batched changes maintain the history; final ≡ one-shot applies") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft-scd2").toString
    val hist0 = Seq((1L, "A", 0L, Option.empty[Long]),
      (2L, "B", 0L, Option.empty[Long]))
      .toDF("k", "seg", "valid_from", "valid_to")
    Maintain.writeRollup(hist0, dir, 0L)

    val src = graft.connectors.Testing.testingSource[(Long, String, Long)](spark)
    val q = Maintain.scd2Stream(src.toDS().toDF("k", "seg", "ts"),
      dir, "k", Seq("seg"), "ts", trigger = Trigger.ProcessingTime(0))
    val b1 = Seq((1L, "C", 10L), (3L, "N", 7L))
    val b2 = Seq((1L, "C", 20L), (2L, "D", 15L)) // no-op repeat + real change
    try {
      src.addBatch(b1: _*); q.processAllAvailable()
      src.addBatch(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val (hist, v) = Maintain.readRollup(spark, dir)
    assert(v === 2L)
    val expected = Maintain.scd2Apply(
      Maintain.scd2Apply(hist0, b1.toDF("k", "seg", "ts"), "k", Seq("seg"), "ts"),
      b2.toDF("k", "seg", "ts"), "k", Seq("seg"), "ts")
    assert(hist.exceptAll(expected).count() === 0 &&
      expected.exceptAll(hist).count() === 0)
    // the maintained history reads correctly as-of mid-stream
    val at12 = Maintain.scd2AsOf(hist, 12L).select($"k", $"seg")
      .as[(Long, String)].collect().toSet
    assert(at12 === Set((1L, "C"), (2L, "B"), (3L, "N")))
  }

  test("scd2AsOf: covering-span point read, open rows cover forever") {
    val hist = Seq(
      (1L, "A", 0L, Some(10L)), (1L, "C", 10L, None),
      (2L, "B", 0L, None))
      .toDF("k", "seg", "valid_from", "valid_to")
    val at5 = scd2Rows(Maintain.scd2AsOf(hist, 5L))
    assert(at5.map(t => (t._1, t._2)) === Seq((1L, "A"), (2L, "B")))
    // boundary: valid_to is exclusive, valid_from inclusive
    val at10 = scd2Rows(Maintain.scd2AsOf(hist, 10L))
    assert(at10.map(t => (t._1, t._2)) === Seq((1L, "C"), (2L, "B")))
  }

  test("commitSnapshot: atomic pointer swap; racing reader keeps its version; vacuum respects grace") {
    val root = java.nio.file.Files.createTempDirectory("graft-snap").toString
    // version 1 published fully, then committed
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(s"$root/snap-1")
    assert(Maintain.resolveSnapshot(spark, root).isEmpty)
    Maintain.commitSnapshot(spark, root, "snap-1")
    assert(Maintain.resolveSnapshot(spark, root) === Some(s"$root/snap-1"))
    // a reader resolves v1 and HOLDS it across the next commit
    val racing = spark.read.parquet(Maintain.resolveSnapshot(spark, root).get)
    Seq((1L, "a2"), (3L, "c")).toDF("k", "v").write.parquet(s"$root/snap-2")
    Maintain.commitSnapshot(spark, root, "snap-2")
    assert(rows(racing) === Seq((1L, "a"), (2L, "b")),
      "reader resolved before the swap must keep seeing its version")
    assert(rows(Maintain.readCurrent(spark, root)) ===
      Seq((1L, "a2"), (3L, "c")))
    // vacuum: a long grace protects the superseded version...
    assert(Maintain.vacuumSnapshots(spark, root, graceMs = 3600000L).isEmpty)
    assert(rows(racing) === Seq((1L, "a"), (2L, "b")))
    // ...grace 0 reclaims exactly the non-current dir
    assert(Maintain.vacuumSnapshots(spark, root, graceMs = 0L) === Seq("snap-1"))
    assert(rows(Maintain.readCurrent(spark, root)) ===
      Seq((1L, "a2"), (3L, "c")))
    // committing a version that was never written must refuse
    intercept[IllegalArgumentException] {
      Maintain.commitSnapshot(spark, root, "snap-9")
    }
  }

  test("staged snapshot protocol: stage is vacuum-proof, commit renames; orphan tmp reclaimed") {
    val root = java.nio.file.Files.createTempDirectory("graft-snap2").toString
    Seq((1L, "a")).toDF("k", "v").write.parquet(s"$root/snap-1")
    Maintain.commitSnapshot(spark, root, "snap-1")
    // a SLOW writer stages version 2 under the underscore name: even
    // a zero-grace vacuum must not touch it (the grace window guards
    // readers; the staging prefix guards writers)
    Seq((1L, "a2")).toDF("k", "v")
      .write.parquet(Maintain.stageSnapshotPath(root, "snap-2"))
    assert(Maintain.vacuumSnapshots(spark, root, graceMs = 0L).isEmpty)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/_stage-snap-2")))
    // commit renames the staged dir into place and flips the pointer
    Maintain.commitSnapshot(spark, root, "snap-2")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/_stage-snap-2")))
    assert(rows(Maintain.readCurrent(spark, root)) === Seq((1L, "a2")))
    // a crashed commit's orphaned _current.tmp-* pointer file is
    // reclaimed once past the grace — dirs and live pointer survive
    val orphan = new org.apache.hadoop.fs.Path(s"$root/_current.tmp-dead")
    val out = fs.create(orphan, true)
    try out.write("snap-9".getBytes) finally out.close()
    assert(Maintain.vacuumSnapshots(spark, root, graceMs = 3600000L).isEmpty)
    assert(Maintain.vacuumSnapshots(spark, root, graceMs = 0L).toSet ===
      Set("snap-1", "_current.tmp-dead"))
    assert(rows(Maintain.readCurrent(spark, root)) === Seq((1L, "a2")))
    // staging a bad name refuses up front
    intercept[IllegalArgumentException] {
      Maintain.stageSnapshotPath(root, "_stage-evil")
    }
  }
}
