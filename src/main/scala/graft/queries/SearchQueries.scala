package graft.queries

import org.apache.spark.sql._
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Search, Similarity, Text}

/** Retrieval gates: the BM25 inverted-index match face and hybrid
  * (lexical ⊕ semantic) reciprocal-rank fusion. Queries derive from
  * the corpus itself (every 20th doc's tokens 3..6), so the gates are
  * self-contained and differential: common terms fan out to many
  * docs, rare terms to few, and short docs exercise the empty-slice
  * edge. The BM25 `ln()` stays spec-side (SearchSpec pins the scored
  * form by hand — the q_text_lm / q_text_tfidf libm precedent); the
  * gates pin every posting join, df lookup, and the fused rrf double,
  * which IS oracle-exact (one IEEE division per list + one add).
  */
object SearchQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // the exact-integer match face of BM25: per (query, doc) the
    // distinct-matched-term count, tf and df sums, and doc length —
    // every input to the score pinned except the spec-side ln()
    "q_search_bm25" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val idx = Search.buildIndex(docs, $"doc_id", $"text")
      val qt = docs.filter($"doc_id" % 20 === 0)
        .select($"doc_id".as("qid"),
          explode(array_distinct(slice(Text.tokens($"text"), 3, 4))).as("term"))
      Search.matchCounts(idx, qt)
    },

    // exact phrase query over the positional index: docs containing
    // the consecutive trigram, with occurrence counts — the
    // position-alignment intersect (postings filtered to the
    // phrase's 3 terms, ONE doc-keyed shuffle, codegen'd fold)
    "q_search_phrase" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val pp = Search.positionalPostings(docs, $"doc_id", $"text")
      Search.phraseDocs(pp, Seq("slow", "hash", "batch"))
    },

    // phrase WORKLOAD over the same positional index: 25 corpus-drawn
    // trigram phrases (tokens 5..7 of every %20 doc) matched in ONE
    // pass — union-of-terms pushdown, broadcast phrase tokens, one
    // data-scale (pid, doc, start) exchange; the oracle aligns each
    // phrase against every doc independently (nested-lambda position
    // scan), so batch-vs-loop row equality is pinned cross-engine
    "q_search_phrase_batch" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val pp = Search.positionalPostings(docs, $"doc_id", $"text")
      val phrases = docs.filter($"doc_id" % 20 === 0)
        .select($"doc_id".as("pid"),
          array_join(slice(Text.tokens($"text"), 5, 3), " ").as("ptext"))
      Search.phraseDocsBatch(pp, phrases, $"pid", $"ptext")
    },

    // proximity (NEAR/12) search for three common terms: the 12-token
    // window admits 132 of ~500 docs at sf0.01 with minimal spans
    // spread over the full 3..12 range, so the window edge, the
    // per-anchor term-min, and the min-span fold are all pinned —
    // an off-by-one in the window bound or a max/min mixup moves rows
    "q_search_prox" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val pp = Search.positionalPostings(docs, $"doc_id", $"text")
      Search.proximityDocs(pp, Seq("scan", "hash", "join"),
        windowTokens = 12)
    },

    // proximity-RANKED retrieval: the same NEAR/12 match folded into
    // a top-20 ranking by (min_span ASC, n_windows DESC, doc_id) —
    // the integer-encodable order rides the map-side top-k and the
    // span columns decode back out of the ranked key, so a rank
    // off-by-one, a tie-break slip, or a decode error all move rows
    "q_search_prox_rank" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val pp = Search.positionalPostings(docs, $"doc_id", $"text")
      Search.proximityTopK(pp, Seq("scan", "hash", "join"),
        windowTokens = 12, k = 20)
    },

    // CDC-updated index ≡ rebuild over the upserted corpus: the same
    // match face as q_search_bm25, but served from updateIndex over
    // the q_upsert change classes (re-written 0-mod-5 docs grow a
    // " v2" token, 0-mod-15 deleted, 0-mod-7 re-keyed inserts) — the
    // dropped postings, ±df merge, and scalar adjustments are all
    // differentially live while the oracle indexes the snapshot
    // from scratch
    "q_search_update" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val changes = docs.filter($"doc_id" % 5 === 0)
        .select($"doc_id", concat($"text", lit(" v2")).as("text"),
          ($"doc_id" % 15 === 0).as("del"))
        .unionByName(docs.filter($"doc_id" % 7 === 0)
          .select(($"doc_id" + 1000000L).as("doc_id"), $"text",
            lit(false).as("del")))
      val idx = Search.updateIndex(
        Search.buildIndex(docs, $"doc_id", $"text"),
        changes, $"doc_id", $"text", Some("del"))
      val qt = docs.filter($"doc_id" % 20 === 0)
        .select($"doc_id".as("qid"),
          explode(array_distinct(slice(Text.tokens($"text"), 3, 4))).as("term"))
      Search.matchCounts(idx, qt)
    },

    // hybrid retrieval: a lexical ranking (coordination-level order —
    // n_terms, tf_sum, id — exactly encodable in integers, so the
    // ranks agree cross-engine with no ln()) RRF-fused with the
    // sign-bucket cosine ANN ranking of q_embed_topk. The rrf double
    // itself is pinned (1/(60+r) is one exact-operand IEEE division,
    // the sum one fixed-order add). Production routes bm25TopK ⊕
    // ivfQueryIndex through the same rrfFuse (hybridTopK).
    "q_search_rrf" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val emb = Tables.load(s, dir, "embeddings")
      val idx = Search.buildIndex(docs, $"doc_id", $"text")
      val qt = docs.filter($"doc_id" % 20 === 0)
        .select($"doc_id".as("qid"),
          explode(array_distinct(slice(Text.tokens($"text"), 3, 4))).as("term"))
      val counts = Search.matchCounts(idx, qt).filter($"doc_id" =!= $"qid")
      // (n_terms, tf_sum) lexicographic order encoded exactly in a
      // double: both < 2^32, composite < 2^53
      val lex = Search.rankCandidates(
        counts.select($"qid", $"doc_id".as("nid"),
          ($"n_terms".cast("double") * lit(4294967296.0) +
            $"tf_sum".cast("double")).as("sim")), 10)
        .select($"qid", $"nid", $"rank")
      val sem = Similarity.bucketTopK(emb, "vec_id", "embedding", 10,
          Similarity.signBucket($"embedding", 4))
        .filter($"qid" % 20 === 0)
        .select($"qid", $"nid", $"rank")
      Search.rrfFuse(lex, sem, k = 5, k0 = 60)
    })

  private val tokSql =
    """tok AS (SELECT doc_id,
      |  list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS w
      |  FROM documents),
      |post AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, UNNEST(w) AS term FROM tok),
      |tf AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf, MIN(dl) AS dl
      |       FROM post GROUP BY 1, 2),
      |lex AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |q AS (SELECT doc_id AS qid, UNNEST(list_distinct(w[3:6])) AS term
      |      FROM tok WHERE doc_id % 20 = 0)""".stripMargin

  /** The q_search_bm25 relational pipeline over the CDC-upserted
    * snapshot; query terms still derive from the ORIGINAL corpus (the
    * queries a user holds don't change when the corpus does).
    */
  private val updTokSql =
    """snap AS (
      |  SELECT b.doc_id, b.text FROM documents b
      |  WHERE b.doc_id NOT IN (
      |    SELECT doc_id FROM (
      |      SELECT doc_id FROM documents WHERE doc_id % 5 = 0
      |      UNION ALL
      |      SELECT doc_id + 1000000 FROM documents WHERE doc_id % 7 = 0))
      |  UNION ALL
      |  SELECT doc_id, text || ' v2' FROM documents
      |  WHERE doc_id % 5 = 0 AND doc_id % 15 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0),
      |tok AS (SELECT doc_id,
      |  list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS w
      |  FROM snap),
      |post AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, UNNEST(w) AS term FROM tok),
      |tf AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf, MIN(dl) AS dl
      |       FROM post GROUP BY 1, 2),
      |lex AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |q AS (SELECT doc_id AS qid,
      |  UNNEST(list_distinct(list_filter(string_split_regex(text, '\s+'), t -> t <> '')[3:6])) AS term
      |      FROM documents WHERE doc_id % 20 = 0)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_search_phrase" ->
      """WITH tok AS (SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS w
        |  FROM documents),
        |occ AS (SELECT doc_id,
        |    len(list_filter(generate_series(1, len(w) - 2), p ->
        |      w[p] = 'slow' AND w[p+1] = 'hash' AND w[p+2] = 'batch'))
        |      AS n_occ
        |  FROM tok)
        |SELECT doc_id, CAST(n_occ AS BIGINT) AS n_occ FROM occ
        |WHERE n_occ > 0""".stripMargin,
    "q_search_phrase_batch" ->
      """WITH tok AS (SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS w
        |  FROM documents),
        |ph AS (SELECT doc_id AS pid, w[5:7] AS pw FROM tok
        |  WHERE doc_id % 20 = 0 AND len(w) >= 5),
        |occ AS (SELECT ph.pid, t.doc_id,
        |    len(list_filter(generate_series(1, len(t.w) - len(ph.pw) + 1), p ->
        |      len(list_filter(generate_series(1, len(ph.pw)), i ->
        |        t.w[p + i - 1] = ph.pw[i])) = len(ph.pw))) AS n_occ
        |  FROM tok t, ph)
        |SELECT pid, doc_id, CAST(n_occ AS BIGINT) AS n_occ
        |FROM occ WHERE n_occ > 0""".stripMargin,
    "q_search_prox" ->
      """WITH tok AS (SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS w
        |  FROM documents),
        |pp AS (SELECT doc_id, w[i] AS term, i - 1 AS pos
        |  FROM tok, UNNEST(generate_series(1, len(w))) AS t(i)
        |  WHERE w[i] IN ('scan', 'hash', 'join')),
        |anch AS (SELECT doc_id, pos AS p FROM pp),
        |j AS (SELECT a.doc_id, a.p, q.term, q.pos FROM anch a JOIN pp q
        |  ON a.doc_id = q.doc_id AND q.pos >= a.p AND q.pos <= a.p + 11),
        |pt AS (SELECT doc_id, p, term, MIN(pos) AS tp FROM j
        |  GROUP BY 1, 2, 3),
        |pa AS (SELECT doc_id, p, COUNT(*) AS nt, MAX(tp) AS far FROM pt
        |  GROUP BY 1, 2)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
        |  CAST(MIN(far - p + 1) AS BIGINT) AS min_span
        |FROM pa WHERE nt = 3 GROUP BY 1""".stripMargin,

    "q_search_prox_rank" ->
      """WITH tok AS (SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS w
        |  FROM documents),
        |pp AS (SELECT doc_id, w[i] AS term, i - 1 AS pos
        |  FROM tok, UNNEST(generate_series(1, len(w))) AS t(i)
        |  WHERE w[i] IN ('scan', 'hash', 'join')),
        |anch AS (SELECT doc_id, pos AS p FROM pp),
        |j AS (SELECT a.doc_id, a.p, q.term, q.pos FROM anch a JOIN pp q
        |  ON a.doc_id = q.doc_id AND q.pos >= a.p AND q.pos <= a.p + 11),
        |pt AS (SELECT doc_id, p, term, MIN(pos) AS tp FROM j
        |  GROUP BY 1, 2, 3),
        |pa AS (SELECT doc_id, p, COUNT(*) AS nt, MAX(tp) AS far FROM pt
        |  GROUP BY 1, 2),
        |res AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
        |  CAST(MIN(far - p + 1) AS BIGINT) AS min_span
        |  FROM pa WHERE nt = 3 GROUP BY 1)
        |SELECT CAST(ROW_NUMBER() OVER (
        |    ORDER BY min_span, n_windows DESC, doc_id) AS BIGINT) AS rank,
        |  doc_id, min_span, n_windows
        |FROM res QUALIFY rank <= 20""".stripMargin,

    "q_search_bm25" ->
      s"""WITH $tokSql
         |SELECT q.qid, t.doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_terms,
         |  CAST(SUM(t.tf) AS BIGINT) AS tf_sum,
         |  CAST(SUM(l.df) AS BIGINT) AS df_sum,
         |  MIN(t.dl) AS dl
         |FROM q JOIN tf t USING (term) JOIN lex l USING (term)
         |GROUP BY 1, 2""".stripMargin,
    "q_search_update" ->
      s"""WITH $updTokSql
         |SELECT q.qid, t.doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_terms,
         |  CAST(SUM(t.tf) AS BIGINT) AS tf_sum,
         |  CAST(SUM(l.df) AS BIGINT) AS df_sum,
         |  MIN(t.dl) AS dl
         |FROM q JOIN tf t USING (term) JOIN lex l USING (term)
         |GROUP BY 1, 2""".stripMargin,
    "q_search_rrf" ->
      s"""WITH $tokSql,
         |cnt AS (SELECT q.qid, t.doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_terms, CAST(SUM(t.tf) AS BIGINT) AS tf_sum
         |  FROM q JOIN tf t USING (term) WHERE t.doc_id <> q.qid GROUP BY 1, 2),
         |lexr AS (SELECT qid, doc_id AS nid,
         |  ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY n_terms DESC, tf_sum DESC, doc_id) AS r
         |  FROM cnt QUALIFY r <= 10),
         |semr AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
         |  ROW_NUMBER() OVER (PARTITION BY a.vec_id
         |    ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) DESC, b.vec_id) AS r
         |  FROM (SELECT vec_id, embedding, ${OracleSql.signBucket(4)} AS bkt
         |        FROM embeddings WHERE vec_id % 20 = 0) a
         |  JOIN (SELECT vec_id, embedding, ${OracleSql.signBucket(4)} AS bkt
         |        FROM embeddings) b
         |    ON a.bkt = b.bkt AND a.vec_id <> b.vec_id
         |  QUALIFY r <= 10),
         |fused AS (SELECT COALESCE(l.qid, s.qid) AS qid, COALESCE(l.nid, s.nid) AS nid,
         |  COALESCE(CAST(1 AS DOUBLE) / CAST(60 + l.r AS DOUBLE), CAST(0 AS DOUBLE)) +
         |  COALESCE(CAST(1 AS DOUBLE) / CAST(60 + s.r AS DOUBLE), CAST(0 AS DOUBLE)) AS rrf
         |  FROM lexr l FULL OUTER JOIN semr s ON l.qid = s.qid AND l.nid = s.nid)
         |SELECT qid, rank, nid, rrf FROM (
         |  SELECT qid, nid, rrf,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf DESC, nid) AS rank
         |  FROM fused)
         |WHERE rank <= 5""".stripMargin)
}
