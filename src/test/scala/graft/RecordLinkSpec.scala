package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.functions.RecordLink

class RecordLinkSpec extends SparkSpec {
  import spark.implicits._

  // (id, name, city, zip) — 1↔2 typo'd name same zip, 2↔3 same name
  // different zip but same city, 4 unrelated, 5 null zip
  private def people = Seq(
    (1L, "john smith", "springfield", "12345"),
    (2L, "jon smith", "springfield", "12345"),
    (3L, "jon smith", "springfield", "99999"),
    (4L, "alice jones", "shelbyville", "54321"),
    (5L, "john smith", "ogdenville", null.asInstanceOf[String])
  ).toDF("id", "name", "city", "zip")

  private val blocks = Seq(col("zip"), col("city"))
  private val payload = Seq(col("name"))
  private val score: (Column, Column) => Column = (a, b) =>
    (lit(2) - levenshtein(a.getField("name"), b.getField("name"))).cast("long")

  test("multi-pass blocking links typos within any shared key; null keys never block") {
    val links = RecordLink.linkPairs(people, col("id"), blocks, payload,
      score, lit(0L))
      .select($"i", $"j").as[(Long, Long)].collect().toSet
    // 1~2 (zip + city), 2~3 (city only), 1~3 (city only); 5 shares a
    // name with 1 but no blocking key → by contract NOT a candidate
    assert(links === Set((1L, 2L), (2L, 3L), (1L, 3L)))
  }

  test("candidates are deduped across blocking passes") {
    val cands = RecordLink.candidatePairs(people, col("id"), blocks, payload)
    // (1,2) blocks on both zip and city — must appear once
    assert(cands.filter($"i" === 1 && $"j" === 2).count() === 1L)
  }

  test("hot-key cap prunes degenerate blocks without touching selective ones") {
    // a constant third key puts ALL rows in one block; cap 3 prunes it
    val capped = RecordLink.linkPairs(people, col("id"),
      blocks :+ lit("ALL"), payload, score, lit(0L), maxBlockSize = 3)
      .select($"i", $"j").as[(Long, Long)].collect().toSet
    assert(capped === Set((1L, 2L), (2L, 3L), (1L, 3L)))
    // uncapped, the constant key admits 5~1 (same name, no shared real key)
    val uncapped = RecordLink.linkPairs(people, col("id"),
      blocks :+ lit("ALL"), payload, score, lit(0L))
      .select($"i", $"j").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((1L, 5L)))
  }

  test("linkClusters transitively closes chains to one entity") {
    val ents = RecordLink.linkClusters(people, col("id"), blocks, payload,
      score, lit(0L))
      .select(col("id").cast("long"), col("entity").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(ents(1L) === 1L && ents(2L) === 1L && ents(3L) === 1L)
    assert(!ents.contains(4L) && !ents.contains(5L))
  }

  test("linkAgainst: two-table matching, one row per pair via the first-shared-key rule") {
    val ref = Seq(
      (10L, "john smith", "springfield", "12345"),
      (11L, "alice jones", "shelbyville", "54321")
    ).toDF("id", "name", "city", "zip")
    val probe = Seq(
      (1L, "jon smith", "springfield", "12345"),  // matches 10 on zip AND city
      (2L, "alice jones", "shelbyville", "99999"), // matches 11 on city only
      (3L, "bob brown", "ogdenville", "00000")
    ).toDF("id", "name", "city", "zip")
    val cands = RecordLink.candidatePairsAgainst(probe, col("id"), ref, col("id"),
      blocks, payload)
    // (1,10) blocks on zip (index 0) and city (index 1) — exactly one row
    assert(cands.filter($"i" === 1 && $"j" === 10).count() === 1L)
    val links = RecordLink.linkAgainst(probe, col("id"), ref, col("id"),
      blocks, payload, score, lit(0L))
      .select($"i", $"j").as[(Long, Long)].collect().toSet
    assert(links === Set((1L, 10L), (2L, 11L)))
  }

  test("linkAgainst hot-cap: a pair whose FIRST shared key is hot is dropped (documented)") {
    // constant first key is hot on the ref side (3 rows > cap 2); the
    // typo pair still shares city at index 1, but its first shared key
    // is the pruned one → dropped, per the capped-space contract
    val ref = Seq(
      (10L, "john smith", "springfield"),
      (11L, "mary major", "shelbyville"),
      (12L, "alice jones", "ogdenville")
    ).toDF("id", "name", "city")
    val probe = Seq((1L, "jon smith", "springfield")).toDF("id", "name", "city")
    val blocks2 = Seq(lit("ALL"), col("city"))
    val got = RecordLink.linkAgainst(probe, col("id"), ref, col("id"),
      blocks2, payload, score, lit(0L), maxBlockSize = 2)
      .select($"i", $"j").as[(Long, Long)].collect().toSet
    assert(got === Set.empty[(Long, Long)])
    // with the cap off, the hot key is the first shared key and links fire
    val uncapped = RecordLink.linkAgainst(probe, col("id"), ref, col("id"),
      blocks2, payload, score, lit(0L))
      .select($"i", $"j").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((1L, 10L)))
  }

  test("linkAgainst is streaming-native: stateless stream-static join with batch parity") {
    val ref = people // the 5-person table as the static entity side
    val probeRows = Seq(
      (101L, "jon smith", "springfield", "12345"),
      (102L, "alice jonez", "shelbyville", "54321"),
      (103L, "zebulon q", "nowhere", "77777"))
    val expected = RecordLink.linkAgainst(
      probeRows.toDF("id", "name", "city", "zip"), col("id"),
      ref, col("id"), blocks, payload, score, lit(0L))
      .select($"i", $"j").as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty)

    val src = graft.connectors.Testing
      .testingSource[(Long, String, String, String)](spark)
    probeRows.grouped(2).foreach(b => src.addBatch(b: _*))
    val linked = RecordLink.linkAgainst(
      src.toDS().toDF("id", "name", "city", "zip"), col("id"),
      ref, col("id"), blocks, payload, score, lit(0L))
    assert(linked.isStreaming, "stream-static linkage must stay streaming")
    val got = graft.streaming.StreamingOps.runToMemory(
      linked.select($"i", $"j"), "rl_stream_out")
      .as[(Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("customer gate shape: both blocking passes contribute links at sf0.001") {
    val c = Tables.load(spark, sf0001, "customer")
    val one = RecordLink.linkPairs(c, $"c_custkey",
      Seq(concat_ws("|", $"c_nationkey", $"c_mktsegment")),
      Seq($"c_name".as("name")), score, lit(0L)).select($"i", $"j")
      .as[(Long, Long)].collect().toSet
    val both = RecordLink.linkPairs(c, $"c_custkey",
      Seq(concat_ws("|", $"c_nationkey", $"c_mktsegment"),
        substring($"c_name", 10, 7)),
      Seq($"c_name".as("name")), score, lit(0L)).select($"i", $"j")
      .as[(Long, Long)].collect().toSet
    assert(one.nonEmpty)
    assert(one.subsetOf(both))
    assert(both.size > one.size, "hundreds-prefix pass must add cross-nation links")
  }
}
