package graft

import org.apache.spark.sql.functions._
import graft.functions.Validate
import graft.functions.Validate._

/** Data-quality validation: exact violation counts per constraint kind
  * on a planted table, the one-scan plan shape, FK orphan semantics
  * (null child keys are not orphans), and the requireValid gate.
  */
class ValidateSpec extends SparkSpec {
  import spark.implicits._

  // id 4 duplicates id 3's key; name null at 2; score 99 out of [0,10];
  // grade "X" outside {A,B}; code "zz9" fails ^[a-z]+$
  private def planted = Seq(
    (1L, Option("alice"), 5.0, "A", "abc"),
    (2L, Option.empty[String], 7.0, "B", "def"),
    (3L, Option("carol"), 99.0, "A", "ghi"),
    (3L, Option("dave"), 3.0, "X", "zz9"),
    (5L, Option("erin"), 0.0, "B", "jk")
  ).toDF("id", "name", "score", "grade", "code")

  test("report: exact violation counts, every kind, both polarities") {
    val rep = Validate.report(planted, Seq(
        NotNull("name"), NotNull("id"), Unique("id"),
        Bounds("score", 0.0, 10.0), InSet("grade", Seq("A", "B")),
        Pattern("code", "^[a-z]+$")))
      .select($"kind", $"col_name", $"violations", $"total", $"passed")
      .as[(String, String, Long, Long, Boolean)].collect().toSet
    assert(rep === Set(
      ("not_null", "name", 1L, 5L, false),
      ("not_null", "id", 0L, 5L, true),
      ("unique", "id", 1L, 5L, false),      // 5 non-null ids, 4 distinct
      ("bounds", "score", 1L, 5L, false),   // 99.0
      ("in_set", "grade", 1L, 5L, false),   // X
      ("pattern", "code", 1L, 5L, false)))  // zz9
  }

  test("unique_tuple: composite-key violations; rows with a null part are out of scope") {
    val df = Seq(
      (Option(1L), Option("a")), (Option(1L), Option("a")),  // dup tuple
      (Option(1L), Option("b")),
      (Option.empty[Long], Option("a")), (Option.empty[Long], Option("a")) // null part ×2
    ).toDF("k1", "k2")
    val rep = Validate.report(df, Seq(UniqueTuple(Seq("k1", "k2"))))
      .select($"kind", $"col_name", $"violations", $"total", $"passed")
      .as[(String, String, Long, Long, Boolean)].head()
    // 3 fully-non-null rows, 2 distinct tuples → 1 violation; the two
    // null-part rows are NOT counted as duplicates of each other
    assert(rep === (("unique_tuple", "k1,k2", 1L, 5L, false)))
    val clean = Seq((1L, "a"), (1L, "b"), (2L, "a")).toDF("k1", "k2")
    assert(Validate.report(clean, Seq(UniqueTuple(Seq("k1", "k2"))))
      .select($"passed").as[Boolean].head())
  }

  test("bounds/in_set/pattern ignore nulls (completeness is not_null's job)") {
    val df = Seq((1L, Option.empty[java.lang.Double], Option.empty[String]))
      .toDF("id", "v", "s")
    val rep = Validate.report(df, Seq(
        Bounds("v", 0.0, 1.0), InSet("s", Seq("a")), Pattern("s", "^a$")))
      .select($"violations").as[Long].collect()
    assert(rep.toSeq === Seq(0L, 0L, 0L))
  }

  test("the whole report is ONE scan of the input") {
    val rep = Validate.report(planted, Seq(
      NotNull("name"), Unique("id"), Bounds("score", 0.0, 10.0)))
    val leaves = rep.queryExecution.executedPlan.collectLeaves()
    assert(leaves.length === 1, s"expected one scan, got:\n${rep.queryExecution.executedPlan}")
  }

  test("fkReport: orphans counted exactly; null child keys are not orphans") {
    val child = Seq(Option(1L), Option(2L), Option(9L), Option.empty[Long])
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val row = Validate.fkReport(child, "fk", parent, "pk")
      .select($"kind", $"col_name", $"violations", $"total", $"passed")
      .as[(String, String, Long, Long, Boolean)].head()
    assert(row === (("foreign_key", "fk", 1L, 4L, false)))
    // intact parent → passes
    val ok = Validate.fkReport(child, "fk", parent.union(Seq(9L).toDF("pk")), "pk")
      .select($"passed").as[Boolean].head()
    assert(ok)
  }

  test("requireValid: passes silently on clean data, throws naming the failures") {
    val clean = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    Validate.requireValid(clean, Seq(NotNull("name"), Unique("id")))
    val ex = intercept[IllegalStateException] {
      Validate.requireValid(planted, Seq(Unique("id"), Bounds("score", 0.0, 10.0)))
    }
    assert(ex.getMessage.contains("unique(id): 1"))
    assert(ex.getMessage.contains("bounds(score): 1"))
  }
}
