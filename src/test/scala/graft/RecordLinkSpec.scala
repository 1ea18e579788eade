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
