package graft

import org.apache.spark.sql.functions._
import graft.functions.{Search, Text}

/** BM25 retrieval + RRF fusion: hand-computed score parity (the ln()
  * the gates keep spec-side), index relation counts, persistence
  * round-trip with term-pushdown serving, doc-disjoint merge ≡ direct
  * build, and fusion edges (one-sided docs, tie-break).
  */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the dog sat"),
    (2L, "a cat and a dog"),
    (3L, "quantum flux capacitor"),
    (4L, "")).toDF("doc_id", "text")

  test("buildIndex relations: postings, lexicon, stats") {
    val idx = Search.buildIndex(corpus, $"doc_id", $"text")
    // doc 0: the×2, cat, sat, on, mat -> 5 postings; doc 2: a×2, cat,
    // and, dog -> 4; doc 4: none
    assert(idx.postings.count() === 5L + 3L + 4L + 3L)
    assert(idx.postings.filter($"term" === "the" && $"doc_id" === 0L)
      .select($"tf", $"dl").as[(Long, Long)].head() === ((2L, 6L)))
    assert(idx.lexicon.filter($"term" === "the").select($"df").as[Long].head() === 2L)
    assert(idx.nDocs === 5L)
    assert(idx.totalTokens === 6L + 3L + 5L + 3L + 0L)
    assert(math.abs(idx.avgdl - 17.0 / 5.0) < 1e-15)
  }

  test("bm25TopK matches the hand-computed Okapi/Lucene formula") {
    val idx = Search.buildIndex(corpus, $"doc_id", $"text")
    val q = Seq((100L, "cat dog")).toDF("qid", "qtext")
    val got = Search.bm25TopK(idx, q, $"qid", $"qtext", k = 10)
      .select($"doc_id", $"score").as[(Long, Double)].collect().toMap
    val n = 5.0; val avgdl = 17.0 / 5.0; val k1 = 1.2; val b = 0.75
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def w(tf: Double, df: Double, dl: Double) =
      idf(df) * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    // cat: df 2 (docs 0,2); dog: df 2 (docs 1,2)
    val exp = Map(
      0L -> w(1, 2, 6), 1L -> w(1, 2, 3), 2L -> (w(1, 2, 5) + w(1, 2, 5)))
    assert(got.keySet === exp.keySet)
    exp.foreach { case (id, e) => assert(math.abs(got(id) - e) < 1e-12, s"doc $id") }
    // both-term doc 2 outranks the single-term docs
    val ranks = Search.bm25TopK(idx, q, $"qid", $"qtext", k = 10)
      .select($"rank", $"doc_id").as[(Long, Long)].collect().toMap
    assert(ranks(1L) === 2L)
  }

  test("edges: unknown-term query scores nothing; query tf collapses to distinct") {
    val idx = Search.buildIndex(corpus, $"doc_id", $"text")
    val q = Seq((1L, "warp core"), (2L, "cat cat cat")).toDF("qid", "qtext")
    val got = Search.bm25TopK(idx, q, $"qid", $"qtext", k = 10)
      .select($"qid", $"doc_id", $"score").as[(Long, Long, Double)].collect()
    assert(got.forall(_._1 === 2L)) // qid 1 matches nothing
    // "cat cat cat" scores identically to "cat" (distinct-term query semantics)
    val single = Search.bm25TopK(idx, Seq((9L, "cat")).toDF("qid", "qtext"),
      $"qid", $"qtext", k = 10).select($"doc_id", $"score").as[(Long, Double)].collect().toMap
    got.foreach { case (_, d, s) => assert(s === single(d)) }
  }

  test("persisted index round-trips bit-identically, with term pushdown reaching parquet") {
    val idx = Search.buildIndex(corpus, $"doc_id", $"text")
    val dir = java.nio.file.Files.createTempDirectory("graft-searchidx").toString
    Search.writeIndex(idx, dir)
    val q = Seq((7L, "cat sat quantum")).toDF("qid", "qtext")
    val direct = Search.bm25TopK(idx, q, $"qid", $"qtext", k = 10)
      .select($"qid", $"rank", $"doc_id", $"score").as[(Long, Long, Long, Double)]
      .collect().sortBy(r => (r._1, r._2))
    val served = Search.bm25TopKIndexed(spark, dir, q, $"qid", $"qtext", k = 10)
    val servedRows = served.select($"qid", $"rank", $"doc_id", $"score")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(servedRows.toSeq === direct.toSeq) // bit-identical incl. the score doubles
    // the term filter reached the postings parquet scan
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"expected term pushdown in:\n$plan")
  }

  test("updateIndex ≡ rebuild over the upserted corpus (incl. empty-doc replacement)") {
    val changes = Seq(
      (0L, "the cat left the mat", false), // replace
      (1L, "", true),                      // delete
      (4L, "formerly empty now speaks", false), // EMPTY doc replaced — the docs-relation edge
      (20L, "a brand new document", false) // insert
    ).toDF("doc_id", "text", "del")
    val updated = Search.updateIndex(
      Search.buildIndex(corpus, $"doc_id", $"text"),
      changes, $"doc_id", $"text", Some("del"))
    val rebuilt = Search.buildIndex(
      graft.functions.Maintain.upsert(corpus, changes, "doc_id", Some("del")),
      $"doc_id", $"text")
    // relations agree as SETS and the scalars exactly
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSet
    assert(rows(updated.postings) === rows(rebuilt.postings))
    assert(rows(updated.lexicon) === rows(rebuilt.lexicon))
    assert(rows(updated.docs) === rows(rebuilt.docs))
    assert(updated.nDocs === rebuilt.nDocs)
    assert(updated.totalTokens === rebuilt.totalTokens)
    // and serving is bit-identical
    val q = Seq((1L, "cat mat brand formerly")).toDF("qid", "qtext")
    def serve(i: Search.SearchIndex) =
      Search.bm25TopK(i, q, $"qid", $"qtext", k = 20)
        .select($"rank", $"doc_id", $"score").as[(Long, Long, Double)]
        .collect().sortBy(_._1).toSeq
    assert(serve(updated) === serve(rebuilt))
    assert(serve(updated).nonEmpty)
  }

  test("merge-on-read index: append v1/v2 updates resolve latest-wins, compact folds") {
    import graft.functions.Maintain
    val dir = java.nio.file.Files.createTempDirectory("graft-idxmor").toString
    Search.writeIndex(Search.buildIndex(corpus, $"doc_id", $"text"), dir)

    val ch1 = Seq((0L, "the cat left the mat", false), (1L, "", true),
      (20L, "a brand new document", false)).toDF("doc_id", "text", "del")
    Search.appendIndexUpdate(spark, dir, ch1, $"doc_id", $"text", version = 1L,
      deleteCol = Some("del"))
    // v2 RE-replaces doc 0 (the vmax path must drop v1's rows) and
    // deletes the doc v1 inserted
    val ch2 = Seq((0L, "cat redux", false), (20L, "", true))
      .toDF("doc_id", "text", "del")
    Search.appendIndexUpdate(spark, dir, ch2, $"doc_id", $"text", version = 2L,
      deleteCol = Some("del"))

    val snap = Maintain.upsert(
      Maintain.upsert(corpus, ch1, "doc_id", Some("del")),
      ch2, "doc_id", Some("del"))
    val rebuilt = Search.buildIndex(snap, $"doc_id", $"text")
    val mor = Search.readIndexMor(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSet
    assert(rows(mor.postings) === rows(rebuilt.postings))
    assert(rows(mor.docs) === rows(rebuilt.docs))
    assert(rows(mor.lexicon) === rows(rebuilt.lexicon))
    assert(mor.nDocs === rebuilt.nDocs && mor.totalTokens === rebuilt.totalTokens)

    // serving through the resolved plan is bit-identical to the rebuild
    val q = Seq((1L, "cat redux dog")).toDF("qid", "qtext")
    def serve(i: Search.SearchIndex) =
      Search.bm25TopK(i, q, $"qid", $"qtext", k = 20)
        .select($"rank", $"doc_id", $"score").as[(Long, Long, Double)]
        .collect().sortBy(_._1).toSeq
    assert(serve(mor) === serve(rebuilt) && serve(mor).nonEmpty)

    // compaction folds the log into a plain writeIndex layout
    val out = java.nio.file.Files.createTempDirectory("graft-idxmor-c").toString
    Search.compactIndex(spark, dir, out)
    val compacted = Search.readIndex(spark, out)
    assert(rows(compacted.postings) === rows(rebuilt.postings))
    assert(serve(compacted) === serve(rebuilt))
  }

  test("doc-disjoint merge serves identically to a direct build over the union") {
    val extra = Seq((10L, "the cat returned"), (11L, "flux dog")).toDF("doc_id", "text")
    val merged = Search.mergeIndexes(
      Search.buildIndex(corpus, $"doc_id", $"text"),
      Search.buildIndex(extra, $"doc_id", $"text"))
    val direct = Search.buildIndex(corpus.unionByName(extra), $"doc_id", $"text")
    assert(merged.nDocs === direct.nDocs && merged.totalTokens === direct.totalTokens)
    val q = Seq((1L, "cat flux the")).toDF("qid", "qtext")
    def rows(i: Search.SearchIndex) =
      Search.bm25TopK(i, q, $"qid", $"qtext", k = 20)
        .select($"rank", $"doc_id", $"score").as[(Long, Long, Double)]
        .collect().sortBy(_._1).toSeq
    assert(rows(merged) === rows(direct))
  }

  test("lowercase analyzer flag: folds build AND serve sides, persists, guards merge") {
    val mixed = Seq(
      (0L, "The CAT sat"),
      (1L, "the dog SAT"),
      (2L, "Quantum Flux")).toDF("doc_id", "text")
    val folded = Search.buildIndex(mixed, $"doc_id", $"text", lowercase = true)
    // postings are case-folded: "The" and "the" are one term
    assert(folded.lexicon.filter($"term" === "the").select($"df").as[Long].head() === 2L)
    assert(folded.lexicon.filter($"term" === "The").count() === 0L)
    // a mixed-case QUERY hits the folded index (the flag drives query folding)
    val q = Seq((1L, "CAT Sat")).toDF("qid", "qtext")
    val hits = Search.bm25TopK(folded, q, $"qid", $"qtext", k = 10)
      .select($"doc_id").as[Long].collect().toSet
    assert(hits === Set(0L, 1L)) // sat matches both, cat matches doc 0
    // the default index stays case-sensitive (back-compat pinned):
    // "CAT" appears verbatim in doc 0, "cAt"/"saT" appear nowhere
    val exact = Search.buildIndex(mixed, $"doc_id", $"text")
    assert(Search.bm25TopK(exact, q, $"qid", $"qtext", k = 10)
      .select($"doc_id").as[Long].collect().toSet === Set(0L))
    val qOdd = Seq((1L, "cAt saT")).toDF("qid", "qtext")
    assert(Search.bm25TopK(exact, qOdd, $"qid", $"qtext", k = 10).count() === 0L)
    // the flag survives the parquet round-trip and drives indexed serving
    val dir = java.nio.file.Files.createTempDirectory("graft-searchlc").toString
    Search.writeIndex(folded, dir)
    assert(Search.readIndex(spark, dir).lowercase)
    val served = Search.bm25TopKIndexed(spark, dir, q, $"qid", $"qtext", k = 10)
      .select($"doc_id").as[Long].collect().toSet
    assert(served === Set(0L, 1L))
    // merging mismatched analyzers is a hard error
    val ex = intercept[IllegalArgumentException] {
      Search.mergeIndexes(folded, exact)
    }
    assert(ex.getMessage.contains("analyzer mismatch"))
  }

  test("bm25Scores feeds hardNegatives: positives filtered pre-rank, top-k refills") {
    val idx = Search.buildIndex(corpus, $"doc_id", $"text")
    val q = Seq((100L, "cat dog")).toDF("qid", "qtext")
    // unfiltered lexical ranking: docs 0, 1, 2 all share a term
    val full = Search.bm25TopK(idx, q, $"qid", $"qtext", k = 3)
      .select($"doc_id").as[Long].collect().toSet
    assert(full === Set(0L, 1L, 2L))
    // the known positive is the TOP-ranked doc: mining must drop it
    // and still return the remaining two negatives (refill property)
    val top = Search.bm25TopK(idx, q, $"qid", $"qtext", k = 1)
      .select($"doc_id").as[Long].head()
    val pos = Seq((100L, top)).toDF("qid", "nid")
    val negs = graft.functions.Similarity.hardNegatives(
      Search.bm25Scores(idx, q, $"qid", $"qtext"), pos, k = 3)
    assert(negs.select($"nid").as[Long].collect().toSet === (full - top))
    // bm25TopK ≡ rank(bm25Scores): the refactor is a pure extraction
    val viaScores = Search
      .rankCandidates(Search.bm25Scores(idx, q, $"qid", $"qtext"), 3)
      .select($"qid", $"rank".cast("long").as("rank"), $"nid", $"sim")
      .collect().map(_.toSeq).toSet
    val direct = Search.bm25TopK(idx, q, $"qid", $"qtext", k = 3)
      .select($"qid", $"rank", $"doc_id", $"score")
      .collect().map(_.toSeq).toSet
    assert(viaScores === direct)
  }

  test("rrfFuse: one-sided docs, both-sided sum, nid tie-break") {
    val a = Seq((1L, 100L, 1L), (1L, 101L, 2L)).toDF("qid", "nid", "rank")
    val b = Seq((1L, 101L, 1L), (1L, 102L, 2L)).toDF("qid", "nid", "rank")
    val got = Search.rrfFuse(a, b, k = 10, k0 = 60)
      .select($"rank", $"nid", $"rrf").as[(Long, Long, Double)].collect()
      .sortBy(_._1).toSeq
    val e100 = 1.0 / 61; val e101 = 1.0 / 62 + 1.0 / 61; val e102 = 1.0 / 62
    assert(got === Seq((1L, 101L, e101), (2L, 100L, e100), (3L, 102L, e102)))
    // identical scores break by ascending nid
    val t1 = Seq((1L, 5L, 1L), (1L, 3L, 2L)).toDF("qid", "nid", "rank")
    val t2 = Seq((1L, 3L, 1L), (1L, 5L, 2L)).toDF("qid", "nid", "rank")
    val tied = Search.rrfFuse(t1, t2, k = 10)
      .select($"rank", $"nid").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(tied === Seq((1L, 3L), (2L, 5L)))
  }

  test("hybridTopK composes bm25 + ivf serving through rrf on real tables") {
    val docs = Tables.load(spark, sf001, "documents")
    val emb = Tables.load(spark, sf001, "embeddings")
    val idx = Search.buildIndex(docs, $"doc_id", $"text")
    val centroids = graft.functions.Similarity.ivfCentroids(emb, "vec_id", "embedding", nlist = 8)
    val cells = graft.functions.Similarity.ivfAssign(emb, "vec_id", "embedding", centroids)
    val q = docs.filter($"doc_id" % 100 === 0)
      .join(emb, $"doc_id" === $"vec_id")
      .select($"doc_id".as("qid"), array_join(slice(Text.tokens($"text"), 3, 4), " ").as("qtext"),
        $"embedding".as("qv"))
    val fused = Search.hybridTopK(idx, q, $"qid", $"qtext", $"qv",
      centroids, cells, k = 5)
    val rows = fused.select($"qid", $"rank", $"nid", $"rrf")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val perQ = rows.groupBy(_._1)
    perQ.values.foreach { rs =>
      assert(rs.length <= 5)
      assert(rs.map(_._2).sorted.toSeq === (1L to rs.length).toSeq)
      // fused scores are non-increasing in rank
      val byRank = rs.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (x, y) => x >= y })
    }
  }

  test("phraseDocs: consecutive-only matches, overlaps, duplicate terms, missing term kills") {
    val docs = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "cat the sat"),          // all terms, wrong order
      (2L, "the cat naps"),         // prefix only
      (3L, "see the cat sat and the cat sat again"), // two occurrences
      (4L, "a a a")                 // duplicate-term phrase fodder
    ).toDF("doc_id", "text")
    val pp = Search.positionalPostings(docs, $"doc_id", $"text")
    def phrase(ts: String*): Map[Long, Long] =
      Search.phraseDocs(pp, ts).as[(Long, Long)].collect().toMap
    assert(phrase("the", "cat", "sat") === Map(0L -> 1L, 3L -> 2L))
    // duplicate-term phrase with overlapping occurrences: "a a" in
    // "a a a" starts at positions 0 and 1
    assert(phrase("a", "a") === Map(4L -> 2L))
    assert(phrase("a", "a", "a") === Map(4L -> 1L))
    // single term degrades to tf
    assert(phrase("the") === Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 3L -> 2L))
    // a term absent from the corpus yields no rows, not an error
    assert(phrase("the", "unicorn") === Map.empty[Long, Long])
    // lowercase analyzer flag normalizes BOTH sides
    val ppLc = Search.positionalPostings(
      Seq((9L, "The CAT Sat")).toDF("doc_id", "text"),
      $"doc_id", $"text", lowercase = true)
    assert(Search.phraseDocs(ppLc, Seq("The", "cat", "SAT"),
      lowercase = true).as[(Long, Long)].collect().toMap === Map(9L -> 1L))
  }

  test("proximityDocs: window edges, minimal span, anchors, degradations") {
    val docs = Seq(
      (0L, "x a y b z"),            // a..b span 3 within w=3
      (1L, "a x x x b"),            // span 5 — needs w >= 5
      (2L, "b a"),                  // order-free: b then a, span 2
      (3L, "a x a b x b"),          // multiple windows, min span 2 (pos 2..3)
      (4L, "a a a"),                // missing b entirely
      (5L, "b x x x x x x x x x a") // span 11
    ).toDF("doc_id", "text")
    val pp = Search.positionalPostings(docs, $"doc_id", $"text")
    def prox(w: Long, ts: String*): Map[Long, (Long, Long)] =
      Search.proximityDocs(pp, ts, w).as[(Long, Long, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // w=3: doc0 (one anchor sees both), doc2 (span 2, both anchor
    // orders), doc3's adjacent pair
    assert(prox(3, "a", "b") ===
      Map(0L -> ((1L, 3L)), 2L -> ((1L, 2L)), 3L -> ((1L, 2L))))
    // w=5 admits doc1 at exactly span 5; w=4 must NOT
    assert(prox(4, "a", "b").get(1L) === None)
    assert(prox(5, "a", "b")(1L) === ((1L, 5L)))
    // exact boundary: span-11 doc needs w=11
    assert(prox(10, "a", "b").get(5L) === None)
    assert(prox(11, "a", "b")(5L) === ((1L, 11L)))
    // duplicate query terms collapse; single term = per-occurrence
    // span-1 windows
    assert(prox(3, "a", "a") === prox(3, "a"))
    assert(prox(3, "a")(4L) === ((3L, 1L)))
    // absent term yields no rows
    assert(prox(9, "a", "unicorn") === Map.empty)
    // lowercase analyzer folds both sides
    val ppLc = Search.positionalPostings(
      Seq((9L, "Alpha BETA")).toDF("doc_id", "text"),
      $"doc_id", $"text", lowercase = true)
    assert(Search.proximityDocs(ppLc, Seq("ALPHA", "beta"), 2,
        lowercase = true).as[(Long, Long, Long)].collect().toSeq ===
      Seq((9L, 1L, 2L)))
  }

  test("proximityTopK: span-first ordering, window-count and id tie-breaks, exact decode") {
    val docs = Seq(
      (0L, "x a y b z"),             // span 3, 1 window
      (1L, "a b x a b"),             // span 2, 2 windows
      (2L, "b a"),                   // span 2, 1 window
      (3L, "a b"),                   // span 2, 1 window — id-tie with doc 2
      (4L, "a x x x x x x x x x b"), // no window within w=5
      (5L, "a a a")                  // missing b
    ).toDF("doc_id", "text")
    val pp = Search.positionalPostings(docs, $"doc_id", $"text")
    val got = Search.proximityTopK(pp, Seq("a", "b"), windowTokens = 5, k = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // order: doc1 (span 2, 3 qualifying anchors: p=0,1,3) < doc2
    // (span 2, 1 window, lower id) < doc3; doc0's span 3 falls off at
    // k=3; decoded (min_span, n_windows) match proximityDocs exactly
    assert(got === Seq((1L, 1L, 2L, 3L), (2L, 2L, 2L, 1L), (3L, 3L, 2L, 1L)))
    // k beyond matches: all ranked, decode equals the feature face
    val all = Search.proximityTopK(pp, Seq("a", "b"), 5, k = 10)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4))).toMap
    val feat = Search.proximityDocs(pp, Seq("a", "b"), 5)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._2))).toMap
    assert(all === feat)
    // the packed-key exactness precondition is ENFORCED: a window of
    // 2^21 tokens would overflow the 2^53 double pack and silently
    // corrupt the ranking — the boundary must throw, the widest
    // exact window must not
    val ex = intercept[IllegalArgumentException] {
      Search.proximityTopK(pp, Seq("a", "b"), 1L << 21, k = 1)
    }
    assert(ex.getMessage.contains("2^21"))
    Search.proximityTopK(pp, Seq("a", "b"), (1L << 21) - 1, k = 1).collect()
  }

  test("phraseDocsBatch ≡ per-phrase phraseDocs loop; one data-scale exchange") {
    val docs = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "cat the sat"),
      (2L, "the cat naps"),
      (3L, "see the cat sat and the cat sat again"),
      (4L, "a a a")
    ).toDF("doc_id", "text")
    val pp = Search.positionalPostings(docs, $"doc_id", $"text")
    val phrases = Seq(
      (10L, "the cat sat"), (11L, "a a"), (12L, "a a a"), (13L, "the"),
      (14L, "the unicorn"), (15L, "")    // token-less phrase: no rows
    ).toDF("pid", "ptext")
    val got = Search.phraseDocsBatch(pp, phrases, $"pid", $"ptext")
      .as[(Long, Long, Long)].collect().toSet
    val want = Seq(
      10L -> Seq("the", "cat", "sat"), 11L -> Seq("a", "a"),
      12L -> Seq("a", "a", "a"), 13L -> Seq("the"),
      14L -> Seq("the", "unicorn")
    ).flatMap { case (pid, ts) =>
      Search.phraseDocs(pp, ts).as[(Long, Long)].collect()
        .map { case (d, n) => (pid, d, n) }
    }.toSet
    assert(got === want)
    // lowercase flag folds the phrase side like positionalPostings
    val ppLc = Search.positionalPostings(
      Seq((9L, "The CAT Sat")).toDF("doc_id", "text"),
      $"doc_id", $"text", lowercase = true)
    assert(Search.phraseDocsBatch(ppLc,
        Seq((1L, "The cat SAT")).toDF("pid", "ptext"),
        $"pid", $"ptext", lowercase = true)
      .as[(Long, Long, Long)].collect().toSet === Set((1L, 9L, 1L)))
    // plan: the corpus-scale relation exchanges ONCE — the
    // (pid, doc, start) partial-aggregable group; phrase tokens and
    // lengths broadcast; under the pushdown cap the term filter
    // reaches the postings relation pre-exchange
    val p = Search.phraseDocsBatch(pp, phrases, $"pid", $"ptext")
      .queryExecution.executedPlan.toString
    val ex = """Exchange hashpartitioning[^\n]*plan_id=(\d+)""".r
    val dataScale = ex.findAllMatchIn(p).count(m =>
      m.matched.contains("start") || m.matched.contains("pos"))
    assert(dataScale <= 1,
      s"expected at most 1 data-scale exchange (pid,doc,start), plan:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }
}
