package graft

import org.apache.spark.sql.functions._
import graft.functions.{CacheScope, Dedup}

/** decontaminateBloom: exactness through the probabilistic prefilter,
  * and the map-side probe's plan shape.
  */
class DecontamBloomSpec extends SparkSpec {

  import spark.implicits._

  private def sides() = {
    val docs = Tables.load(spark, sf0001, "documents")
    (docs.filter($"doc_id" % 50 =!= 0), docs.filter($"doc_id" % 50 === 0))
  }

  test("bloom path is row-identical to the exact path") {
    val (train, eval) = sides()
    val exact = Dedup.decontaminate(train, $"doc_id", $"text", eval, $"text", 5, 3)
      .as[(Long, Long)].collect().sorted.toSeq
    val scope = new CacheScope
    val bloom = Dedup.decontaminateBloom(train, $"doc_id", $"text", eval, $"text", 5, 3,
        scope = scope)
      .as[(Long, Long)].collect().sorted.toSeq
    scope.close()
    assert(exact.nonEmpty, "fixture must exercise a non-empty contamination set")
    assert(bloom === exact)
  }

  test("exactness holds even at an absurd fpp (pure-FP bloom)") {
    // fpp 0.9 makes the prefilter nearly useless — every FP must still
    // be removed by the exact verify join
    val (train, eval) = sides()
    val exact = Dedup.decontaminate(train, $"doc_id", $"text", eval, $"text", 5, 3)
      .as[(Long, Long)].collect().sorted.toSeq
    val loose = Dedup.decontaminateBloom(train, $"doc_id", $"text", eval, $"text", 5, 3,
        fpp = 0.9)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(loose === exact)
  }

  test("probe is a codegen'd might_contain filter on the train scan side") {
    val (train, eval) = sides()
    val plan = Dedup.decontaminateBloom(train, $"doc_id", $"text", eval, $"text", 5, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
  }
}
