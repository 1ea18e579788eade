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

  test("the sketch suite is drivable from pure SQL: build, merge, probe") {
    GraftExtensions.register(spark)
    Tables.load(spark, sf0001, "events").createOrReplaceTempView("ext_events")
    // per-type HLL sketches merged in SQL == the direct whole-table sketch
    val hll = spark.sql(
      """WITH parts AS (
        |  SELECT event_type, hll_sketch(splitmix64(user_id), 8) AS sk
        |  FROM ext_events GROUP BY event_type)
        |SELECT hll_estimate(hll_merge(sk)) AS merged,
        |       (SELECT hll_estimate(hll_sketch(splitmix64(user_id), 8))
        |        FROM ext_events) AS direct
        |FROM parts""".stripMargin).head()
    assert(hll.getDouble(0) === hll.getDouble(1))
    // CMS: SQL estimate >= exact for a known-hot key
    val cms = spark.sql(
      """WITH sk AS (SELECT cms_sketch(splitmix64(user_id), 1L, 3, 64) AS s
        |            FROM ext_events)
        |SELECT cms_estimate(s, splitmix64(7L)) AS est,
        |       (SELECT COUNT(*) FROM ext_events WHERE user_id = 7) AS exact
        |FROM sk""".stripMargin).head()
    assert(cms.getLong(0) >= cms.getLong(1))
    // bloom: member hits, non-member id space mostly misses
    val bloom = spark.sql(
      """WITH sk AS (SELECT bloom_sketch(splitmix64(user_id), 4096, 3) AS s
        |            FROM ext_events)
        |SELECT bloom_contains(s, splitmix64((SELECT MIN(user_id) FROM ext_events))) AS hit,
        |       size(bloom_bits(s)) AS n_set
        |FROM sk""".stripMargin).head()
    assert(bloom.getBoolean(0) && bloom.getInt(1) > 0)
    // corpus minhash self-overlap is k; hist quantile slot is in range
    val rest = spark.sql(
      """WITH sig AS (SELECT corpus_minhash(splitmix64(user_id), 16) AS g
        |             FROM ext_events),
        |     h AS (SELECT hist_sketch(value, 0.0D, 100.0D, 10) AS hh
        |           FROM ext_events)
        |SELECT size(filter(zip_with(g, g, (x, y) -> x = y), m -> m)) AS self_eq,
        |       hist_quantile_slot(hh, 0.5D) AS q50
        |FROM sig, h""".stripMargin).head()
    assert(rest.getInt(0) === 16)
    assert(rest.getInt(1) >= 0 && rest.getInt(1) <= 11)
    // kmv: 5 smallest-hash users, deterministic and SQL-merged
    val kmv = spark.sql(
      """WITH parts AS (SELECT event_type,
        |    kmv_sample(splitmix64(user_id), CAST(user_id AS STRING), 5) AS s
        |  FROM ext_events GROUP BY event_type)
        |SELECT kmv_merge(s, 5) AS m,
        |  (SELECT kmv_sample(splitmix64(user_id), CAST(user_id AS STRING), 5)
        |   FROM ext_events) AS direct
        |FROM parts""".stripMargin).head()
    assert(kmv.getSeq[org.apache.spark.sql.Row](0) ==
      kmv.getSeq[org.apache.spark.sql.Row](1))
    // fnv1a64 in SQL == the JVM hash
    val f = spark.sql("SELECT fnv1a64('alpha') AS h").head().getLong(0)
    assert(f === graft.functions.SimHashImpl.fnv1a(
      org.apache.spark.unsafe.types.UTF8String.fromString("alpha")))
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

  test("SQL int8_quantize/int8_dot/dhash match their Column counterparts") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT int8_dot(int8_quantize(array(cast(1.0 as double), cast(-0.5 as double))),
        |               int8_quantize(array(cast(1.0 as double), cast(-0.5 as double)))) AS d,
        |       int8_quantize(array(cast(1.0 as double), cast(-0.5 as double))) AS q,
        |       dhash(cast('ab' as binary), 49) AS dh
        |""".stripMargin).head()
    // codes: 127, floor(-63.5+0.5) = -63 → dot = 127² + 63² = 20098
    assert(r.getAs[Long]("d") === (127L * 127 + 63L * 63))
    assert(r.getAs[Seq[Byte]]("q") === Seq[Byte](127, -63))
    // 'b' > 'a' → bit 0
    assert(r.getAs[Long]("dh") === 1L)
  }
}
