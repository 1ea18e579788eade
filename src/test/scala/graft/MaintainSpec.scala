package graft

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

  test("upsertLatest version tie prefers the tombstone (arrival-order independent)") {
    val a = Seq((1L, "up", 5L, false), (1L, "x", 5L, true)).toDF("k", "v", "ver", "del")
    val b = Seq((1L, "x", 5L, true), (1L, "up", 5L, false)).toDF("k", "v", "ver", "del")
    for (ch <- Seq(a, b)) {
      assert(rows(Maintain.upsertLatest(base, ch, "k", "ver", Some("del"))) ===
        Seq((2L, "two"), (3L, "three")))
    }
  }
}
