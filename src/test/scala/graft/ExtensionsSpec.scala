package graft

import org.apache.spark.sql.functions._
import graft.operators.Ops

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT simhash64(array('a','b')) AS sh,
        |       size(minhash_sig(array('a b c'), 16)) AS mh_len,
        |       cosine_sim(array(cast(1.0 as double), cast(0.0 as double)),
        |                  array(cast(1.0 as double), cast(0.0 as double))) AS cs
        |""".stripMargin).head()
    assert(row.getAs[Long]("sh") !== 0L)
    assert(row.getAs[Int]("mh_len") === 16)
    assert(math.abs(row.getAs[Double]("cs") - 1.0) < 1e-12)
  }

  test("SQL shingles and adler32 match their Column/JVM counterparts") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT shingles('a b c d', 3) AS sh, adler32('alpha') AS a32""").head()
    assert(row.getSeq[String](0) === Seq("a b c", "b c d"))
    val expected = { val a = new java.util.zip.Adler32(); a.update("alpha".getBytes("UTF-8")); a.getValue }
    assert(row.getAs[Long]("a32") === expected)
  }

  test("SQL ngram_stats and winnow match their Column counterparts") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT ngram_stats('a b a b a', 2) AS st, winnow('abcdefghijklmno', 8, 4) AS fp"""
    ).head()
    val st = row.getStruct(0)
    assert((st.getInt(0), st.getInt(1), st.getInt(2)) === ((4, 2, 2)))
    val viaColumn = Seq("abcdefghijklmno").toDF("t")
      .select(graft.functions.Winnow.winnow(col("t"), 8, 4)).as[Seq[Long]].head()
    assert(row.getSeq[Long](1) === viaColumn)
  }

  test("SQL simhash64 equals the Column API simhash64") {
    GraftExtensions.register(spark)
    val docs = Tables.load(spark, sf0001, "documents").limit(50)
    val viaCol = docs.select($"doc_id",
      graft.functions.SimHash.simhash64(graft.functions.Text.tokens($"text")).as("h"))
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, simhash64(filter(split(text, '\\\\s+'), t -> t != '')) AS h FROM ext_docs")
    assert(viaCol.as[(Long, Long)].collect().toSet === viaSql.as[(Long, Long)].collect().toSet)
  }

  test("saltedAgg equals plain aggregation (skew-safe two-phase)") {
    val ev = Tables.load(spark, sf0001, "events")
    val plain = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"value".cast("decimal(12,2)")).cast("double").as("total"))
    val salted = Ops.saltedAgg(ev, "event_type", 8,
      partial = Seq(count(lit(1)).as("pn"), sum($"value".cast("decimal(12,2)")).as("pt")),
      fin = Seq(sum($"pn").as("n"), sum($"pt").cast("double").as("total")))
    assert(plain.as[(String, Long, Double)].collect().toSet ===
      salted.as[(String, Long, Double)].collect().toSet)
  }
}
