package graft.queries

import org.apache.spark.sql._
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Dedup, Hll, Multimodal, Sampling, Similarity, Text}

/** Correctness-gate queries for the training-data-pipeline operators:
  * text analysis, dedup (exact / n-gram Jaccard / MinHash-LSH /
  * SimHash), embedding similarity search, multimodal plumbing.
  *
  * Every query is DuckDB-oracled, including the wrapping-arithmetic
  * hash families: FNV-1a/splitmix64 are rendered in UBIGINT (xor,
  * shift) with 128-bit HUGEINT multiplies mod 2^64, and order-sensitive
  * double folds (simhash votes, LSH dot products) use ordered
  * list_reduce so float addition order matches the Scala loops.
  */
object LlmQueries {

  private val stop = Text.langStopwords.head._2 // en stopwords

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // token counting + basic stats
    "q_text_stats" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      docs.select($"doc_id",
        Text.tokenCount($"text").cast("long").as("n_tokens"),
        Text.alphaChars($"text").cast("long").as("n_alpha"),
        Text.tokenLengthChecksum($"text").as("checksum"))
    },

    // quality scoring
    "q_text_quality" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      docs.select($"doc_id", Text.qualityScore($"text", stop).as("quality"))
    },

    // domain-level curation: drop every doc whose SOURCE fails the
    // aggregate gate (mean tokens/doc ≥ 54, alpha share ≥ 800‰) —
    // exact integer cross-multiplications, no float means. At sf0.01
    // the 54-token threshold splits the 20 sources roughly in half,
    // so both keep and drop are live at source granularity
    "q_source_filter" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      Text.sourceFilter(docs, "source", $"text", 54L, 800L)
        .select($"doc_id", $"source")
    },

    // sequence packing (training assembly): fixed-token-budget packs,
    // salted into 8 independent packing streams (id mod 8); a doc
    // joins the pack open when it starts, so packs overflow by at
    // most one document — the streaming-packer semantics. Fully
    // relational: one in-partition sort window per salt bucket, no
    // global ordering bottleneck; the oracle renders the identical
    // SUM OVER.
    "q_text_pack" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      Text.packSequences(docs, $"doc_id", $"text", budget = 512, buckets = 8)
    },

    // inference-serving batch planner (pad-to-max dual of the pack
    // gate): fixed-grid length bins, per-bin length-rank batching —
    // the report face pins assignment + padding arithmetic in exact
    // integers
    "q_text_batch" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      Text.lengthBatchReport(docs, $"doc_id", $"text",
        batchSize = 8, binWidth = 16)
    },

    // deterministic hash-based down-sampling: membership is a pure
    // function of (id, salt) — retry-stable and re-runnable, unlike
    // rand(seed) which is seeded per partition
    "q_sample" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      Sampling.hashSample(docs, $"doc_id", rate = 0.25, salt = 7L)
        .select($"doc_id")
    },

    // weight-proportional Bernoulli sampling: P(keep) = n_chars/8192,
    // exact decimal comparison (no double rounding at 2^63 scale)
    "q_sample_weighted" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      Sampling.weightedSample(docs, $"doc_id", $"n_chars", maxWeight = 8192L, salt = 7L)
        .select($"doc_id", $"n_chars")
    },

    // DSIR importance resampling (Xie et al. 2023): hashed-bigram
    // bucket-ratio model fit on the src0 target slice, every raw doc
    // weighted by its mean bucket ratio (exact micro-unit integers —
    // the ln-free arithmetic ratio face; FNV-1a gram hashing and the
    // splitmix64 keep threshold both HUGEINT-mirrorable), then
    // weight-proportional Bernoulli keep. Face: (doc_id, ir_w) of
    // the kept sample — pins the model counts, the ratio floor
    // divisions, the per-doc mean, and the keep boundary at once
    "q_sample_dsir" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val target = docs.filter($"source" === "src0")
      Sampling.importanceResample(docs, $"doc_id", $"text", target, $"text",
          numBuckets = 128, n = 2, maxRatio = 2L, salt = 13L)
        .select($"doc_id", $"ir_w")
    },

    // corpus mixing to a token budget: per-source totals from one
    // aggregation, keep decision in exact decimal(38,0) — the rate is
    // never a double, so the sample hash-matches cross-engine. src0's
    // share saturates (rate > 1 keeps the whole stratum), src1 is
    // mid-rate, the default share is sparse — all three regimes live.
    "q_sample_mix" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      Sampling.mixToBudget(docs, $"doc_id", $"source", $"n_chars",
          targetTotal = 50000L, sharesPm = Map("src0" -> 400L, "src1" -> 100L),
          defaultSharePm = 20L, salt = 11L)
        .select($"doc_id", $"source", $"n_chars")
    },

    // stratified sampling / corpus mixing: per-stratum keep rates in
    // one codegen'd CASE (stratum here = doc_id mod 3 so the oracle
    // is closed-form; production strata are language/quality/source)
    "q_sample_strat" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .withColumn("stratum", pmod($"doc_id", lit(3L)).cast("string"))
      Sampling.stratifiedSample(docs, $"doc_id", $"stratum",
          rates = Map("0" -> 0.1, "1" -> 0.5), defaultRate = 1.0, salt = 7L)
        .select($"doc_id", $"stratum")
    },

    // deterministic fixed-quota selection: exactly k docs per stratum,
    // drawn uniformly by the splitmix64 permutation key — the count-
    // exact companion to rate-based stratified sampling
    "q_sample_take" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .withColumn("stratum", pmod($"doc_id", lit(3L)).cast("string"))
      Sampling.takePerStratum(docs, $"doc_id", $"stratum", k = 40, seed = 7L)
        .select($"doc_id", $"stratum")
    },

    // semantic cluster-balanced sampling: nearest-seed-centroid
    // assignment (the q_embed_ivf coarse quantizer, SQL-expressible) +
    // an exactly-5-per-cluster permutation draw — the flatten-the-
    // topic-distribution mixing step; production trains centroids
    // (Lloyd) and the temperature-rate variant is spec-side (pow())
    "q_sample_cluster" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding",
        nlist = 16, iterations = 0)
      Sampling.clusterBalancedSample(emb, "vec_id", "embedding", cents,
        perCluster = 5, seed = 7L)
    },

    // deterministic corpus shuffle + sharding: one hash-partition
    // shuffle + in-partition sort; (shard, pos) is a pure function of
    // (id, seed) — the retry-stable replacement for sort(rand())
    "q_shuffle_shard" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      Sampling.shuffleShards(docs.select($"doc_id"), $"doc_id",
        numShards = 8, seed = 7L)
    },

    // training-sequence assembly: each pack's docs concatenated in id
    // order — the materialization step after q_text_pack's assignment
    "q_text_pack_asm" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      Text.assemblePacks(docs, $"doc_id", $"text", budget = 512, buckets = 8)
    },

    // language-ID heuristic (stopword vote)
    "q_text_langid" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      docs.select($"doc_id", Text.langId($"text").as("lang_guess"))
    },

    // repetition quality signals (Gopher-style duplicate-n-gram and
    // top-n-gram fractions) — one fused scan per n, no shuffle
    "q_text_repetition" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val g2 = Text.ngramStats($"text", 2)
      docs.select($"doc_id",
        g2.getField("n_grams").cast("long").as("n_2grams"),
        g2.getField("n_distinct").cast("long").as("d_2grams"),
        g2.getField("top_count").cast("long").as("top_2gram"),
        Text.dupNgramRatio($"text", 2).as("dup_2gram_ratio"),
        Text.dupNgramRatio($"text", 3).as("dup_3gram_ratio"),
        Text.topNgramFraction($"text", 2).as("top_2gram_frac"))
    },

    // CCNet-style LM quality scoring, exact-integer face: bigram LM
    // trained on the even-doc split, every doc scored; the five count
    // sums pin every model lookup (the ln()s stay spec-side — libm
    // last-ulp, the q_text_tfidf precedent). Odd docs exercise the
    // backoff path differentially (their bigrams may be train-unseen).
    "q_text_lm" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val model = Text.lmTrain(docs.filter($"doc_id" % 2 === 0), $"text")
      Text.lmScoreCounts(docs, $"doc_id", $"text", model)
    },

    // model-based classification (FineWeb-Edu/DCLM-style), exact-integer
    // face: multinomial NB trained on the even-doc split with lang as the
    // class label, every doc scored against every class. The count sums
    // pin every model lookup (the ln()s stay spec-side — the q_text_lm
    // precedent); odd docs exercise the unseen-token smoothing path.
    "q_text_classify" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val model = graft.functions.Classify.nbTrain(
        docs.filter($"doc_id" % 2 === 0), $"lang", $"text")
      graft.functions.Classify.nbScoreCounts(docs, $"doc_id", $"text", model)
    },

    // Gopher-rule quality filter: per-rule booleans + keep, every
    // comparison exact-integer (per-mille thresholds). Thresholds
    // chosen so each rule is differentially live on this corpus
    // (word count splits at 20, mean length at 4.0, repetition at
    // 0.10); ok_alpha is vacuously true here (all-alpha corpus) but
    // pinned anyway.
    "q_text_gopher" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val r = Text.gopherRules($"text", stop, Text.GopherThresholds(
        minTokens = 20, meanLenMinPm = 4000L, dup2MaxPm = 100L, top2MaxPm = 100L))
      docs.select($"doc_id",
        r.getField("ok_word_count").as("ok_word_count"),
        r.getField("ok_mean_word_len").as("ok_mean_word_len"),
        r.getField("ok_alpha").as("ok_alpha"),
        r.getField("ok_stopwords").as("ok_stopwords"),
        r.getField("ok_dup_2gram").as("ok_dup_2gram"),
        r.getField("ok_top_2gram").as("ok_top_2gram"),
        r.getField("keep").as("keep"))
    },

    // the curation AUDIT face of the rule filter: per-source rejection
    // profile (how many docs each rule would cut) — what a pipeline
    // owner reads before rerunning a 100 TB pass with new thresholds.
    // One grouped aggregation over the same fused rule projection.
    "q_quality_report" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val r = Text.gopherRules($"text", stop, Text.GopherThresholds(
        minTokens = 20, meanLenMinPm = 4000L, dup2MaxPm = 100L, top2MaxPm = 100L))
      def fails(f: String) = sum(when(r.getField(f), 0L).otherwise(1L))
      docs.groupBy($"source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(r.getField("keep"), 1L).otherwise(0L)).as("n_keep"),
        fails("ok_word_count").as("n_fail_words"),
        fails("ok_mean_word_len").as("n_fail_mean"),
        fails("ok_alpha").as("n_fail_alpha"),
        fails("ok_stopwords").as("n_fail_stop"),
        fails("ok_dup_2gram").as("n_fail_dup2"),
        fails("ok_top_2gram").as("n_fail_top2"))
    },

    // document fingerprinting
    "q_text_fingerprint" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      docs.select($"doc_id", Text.fingerprint($"text").as("fp"))
    },

    // TF-IDF top terms per doc. The gate ranks by tf/(df+1) — order-
    // equivalent to the smoothed tf-idf for a fixed corpus (idf is
    // monotone decreasing in df) but free of ln(), whose last-ulp
    // behavior is libm-specific and NOT identical between JVM and
    // DuckDB (unlike +,*,/ which IEEE 754 specifies exactly). Ties
    // break by term; integer tf/df columns pin the exact counts.
    "q_text_tfidf" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val w = Text.tfidf(docs, $"doc_id", $"text")
      val score = $"tf".cast("double") / ($"df" + lit(1)).cast("double")
      w.withColumn("rank",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy($"id").orderBy(score.desc, $"term".asc)).cast("long"))
        .filter($"rank" <= 3)
        .select($"id".as("doc_id"), $"term", $"tf", $"df", $"rank")
    },

    // BPE-ish regex token counting: the GPT-2-style pre-tokenizer
    // (contractions / letter runs / digit runs / punctuation runs)
    // through the codegen'd native regexp_extract_all; digest pins the
    // full token sequence, not just the count
    "q_text_bpe" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      docs.select($"doc_id",
        Text.bpeTokenCount($"text").cast("long").as("n_bpe"),
        md5(concat_ws("\u0001", Text.bpeTokens($"text"))).as("digest"))
    },

    // winnowing fingerprints (rolling k-gram hash, window-min
    // selection — SIGMOD'03): the bounded content-addressed signature
    // set per doc. Oracle re-renders the wrapping Rabin-Karp fold in
    // UBIGINT/HUGEINT and the window minima via a ROWS frame.
    "q_text_winnow" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      docs.select($"doc_id",
        explode(graft.functions.Winnow.winnow($"text", 8, 4)).as("fp"))
    },

    // winnowing near-dup pairs: shared-fingerprint inverted index,
    // thresholded on the overlap coefficient (shared / smaller set),
    // with the stop-fingerprint cap exercised (sized above corpus df —
    // provably no-op, skew guard in the plan). k=16 so a gram spans ~3
    // vocabulary words: this corpus's ~30-word vocabulary makes every
    // 8-char junction gram corpus-hot (df grows linearly with corpus
    // size → the index self-join degenerates toward all-pairs, measured
    // 38 s at sf0.1), while 16-char grams keep organic df O(1). On
    // natural text the vocabulary does this job and k=8 is fine; the
    // general protection is the df cap, which the skew gate proves.
    "q_dedup_winnow" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      Dedup.winnowPairs(docs, $"doc_id", $"text", k = 16, w = 4,
        minOverlap = 0.5, maxDocFreq = 1000)
    },

    // Skew stress for the winnow stop-fingerprint cap, symmetric with
    // q_dedup_ngram_skew: every doc gets the shared boilerplate tail,
    // so the tail's fingerprints reach df = corpus size — over the cap
    // of 50, which genuinely BINDS (q_dedup_winnow's 1000 provably
    // cannot). The oracle applies the identical cap in SQL; overlap is
    // computed in the capped fingerprint space on both sides (hot
    // boilerplate leaves numerator and denominator together — see the
    // winnowPairs scaladoc for why that beats the lower-bound form
    // under a binding cap). Threshold 0.4 keeps margin against the
    // tail-inflated fingerprint sets. k is 16 here
    // (vs the base gate's 8): a 16-char gram spans ~3 vocabulary words,
    // so organic fingerprint df stays O(1) in corpus size and only the
    // boilerplate is hot — with k=8 on this small-vocab corpus every
    // junction gram's df grows with the corpus and the cap would
    // (correctly but uselessly) empty the index at 10× scale.
    "q_dedup_winnow_skew" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select($"doc_id", concat($"text", lit(" " + boilerplate)).as("text"))
      Dedup.winnowPairs(docs, $"doc_id", $"text", k = 16, w = 4,
        minOverlap = 0.4, maxDocFreq = 50)
    },

    // exact dedup via content fingerprint
    "q_dedup_exact" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      Dedup.exact(docs, $"doc_id", $"text")
    },

    // exact n-gram Jaccard near-dup pairs, through the doc-frequency-
    // capped path (the production stop-shingle mitigation). The cap is
    // far above the corpus's max shingle df (25 at sf0.1, asserted in
    // FunctionsSpec), so the oracle answer is provably unchanged while
    // the gate exercises the skew-bounded plan.
    "q_dedup_ngram" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      Dedup.ngramJaccardPairs(docs, $"doc_id", $"text", n = 3, threshold = 0.5,
        maxDocFreq = 1000)
    },

    // prefix-filtered EXACT all-pairs (Bayardo WWW'07): same oracle as
    // the inverted-index path — prefix filtering must be invisible in
    // the result, that is the completeness guarantee under test
    "q_dedup_ngram_prefix" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      Dedup.ngramJaccardPairsPrefix(docs, $"doc_id", $"text", n = 3,
        threshold = 0.5)
    },

    // DIRECTED containment pairs (|sh_i ∩ sh_j| / |sh_i| ≥ 0.6):
    // the asymmetric dedup face — a doc quoted inside a longer one
    // scores high containment but low Jaccard, so this catches
    // subsumption the Jaccard gates structurally can't. Cap sized
    // above the corpus max df (provable no-op), like q_dedup_ngram
    "q_dedup_containment" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      Dedup.containmentPairs(docs, $"doc_id", $"text", n = 3,
        threshold = 0.6, maxDocFreq = 1000)
    },

    // corpus collocation mining: adjacent-bigram conditional lift
    // p(y|x)/p(y) in exact micro-units over the whole corpus — the
    // phrase-discovery/template-detection face; min-count prunes the
    // hapax bigram tail before any join
    "q_text_pmi" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      graft.functions.Text.collocations(docs, $"text", minCount = 5)
    },

    // GloVe-style windowed co-occurrence counts (±3, directed): the
    // embedding-training pre-pass statistic; pairs from an in-array
    // index transform (no positional self-join), one count aggregate
    "q_text_cooc" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      graft.functions.Text.cooccurrence(docs, $"text", window = 3,
        minCount = 5)
    },

    // Skew stress: every doc gets a shared boilerplate tail, so the
    // boilerplate shingles' document frequency equals the corpus size —
    // far over the df cap, which genuinely BINDS here (unlike
    // q_dedup_ngram where it is provably a no-op). Jaccard is computed
    // in the CAPPED shingle space on both engines (hot boilerplate
    // leaves numerator and denominator together — the winnow-settled
    // form; the lower-bound alternative measured 10% recall under a
    // binding cap, see ngramJaccardPairs scaladoc). The oracle applies
    // the identical cap rule in SQL, so the capped *semantics* (not
    // just the plan shape) are hash-verified.
    "q_dedup_ngram_skew" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select($"doc_id", concat($"text", lit(" " + boilerplate)).as("text"))
      Dedup.ngramJaccardPairs(docs, $"doc_id", $"text", n = 3, threshold = 0.3,
        maxDocFreq = 50)
    },

    // MinHash+LSH candidates, exact-verified (oracle: exact pairs).
    // Runs the band-bucket-capped path (cap 1000 > corpus size, so no
    // bucket can bind — answer provably unchanged, skew guard exercised).
    "q_dedup_minhash" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      Dedup.minhashLshPairs(docs, $"doc_id", $"text", n = 3,
        numHashes = 64, bands = 16, threshold = 0.5, maxBucketSize = 1000)
    },

    // Skew stress for the band-bucket cap, symmetric with
    // q_dedup_ngram_skew: the 60 lowest-id docs are rewritten to one
    // identical boilerplate text, so each of their 16 band buckets holds
    // 60 docs — over the cap of 50, which genuinely BINDS here (the cap
    // in q_dedup_minhash is sized above the corpus and provably no-op).
    // Every skew-group bucket is dropped, so the 60-clique's 1770 pairs
    // must NOT appear; base-corpus pairs keep their small buckets. The
    // oracle re-renders the full MinHash pipeline in DuckDB (FNV-1a
    // base, the same inlined a_k·x+b_k constants, signed-min
    // signatures) and applies the identical cap rule — buckets are
    // grouped by the band's raw 4-value slice, which partitions exactly
    // as the implementation's xxhash64(slice) key does.
    "q_dedup_minhash_skew" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select($"doc_id",
          when($"doc_id" < 60, lit(skewText)).otherwise($"text").as("text"))
      Dedup.minhashLshPairs(docs, $"doc_id", $"text", n = 3,
        numHashes = 64, bands = 16, threshold = 0.5, maxBucketSize = 50)
    },

    // SimHash near-dup pairs (custom codegen expression). Oracled via
    // DuckDB UBIGINT/HUGEINT: FNV-1a's wrapping multiply is rendered as
    // a 128-bit multiply mod 2^64 inside an ordered list_reduce fold.
    "q_dedup_simhash" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      Dedup.simhashPairs(docs, $"doc_id", $"text", maxHamming = 7)
        .select($"i", $"j", $"hamming".cast("long").as("hamming"))
    },

    // embedding similarity: same-bucket pairs over threshold via the
    // sign-bit LSH bucket — the scale path (bucket join, no cross join).
    // The brute-force cosinePairs stays as the spec-only recall baseline.
    "q_embed_pairs" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.bucketedCosinePairs(emb, "vec_id", "embedding",
        threshold = 0.5, bits = 4)
    },

    // OR-amplified LSH pairs — the round-6 production pair path
    // (LshSketchExpr): 2 tables × 4 bits here so the full splitmix64
    // sketch, the any-table candidate union, and the exact cosine
    // verify are all oracle-rendered in DuckDB; production auto-sizes
    // via bucketedCosinePairsAuto (bits = log2(N/64), tables = 8). A
    // row appears iff the pair colocates in at least one table AND
    // passes the threshold, so the oracle pins every per-table bucket
    // assignment pair-wise.
    "q_embed_pairs_amp" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.bucketedCosinePairs(emb, "vec_id", "embedding",
        threshold = 0.3, bits = 4, tables = 2)
    },

    // bucket-local top-3 neighbors under the sign-bit LSH bucket —
    // candidate set |C|/2^bits per query, no cross join. Rank-only
    // output (sims diverge from DuckDB by ~1 ulp). bruteForceTopK is
    // the spec-only exactness baseline.
    "q_embed_topk" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.bucketTopK(emb, "vec_id", "embedding", k = 3,
          Similarity.signBucket($"embedding", 4))
        .select($"qid", $"rank".cast("long").as("rank"), $"nid")
    },

    // PQ-compressed ADC top-3 inside the sign-bit bucket (the IVF-PQ
    // shape: coarse partition outside, m-byte codes + LUT scoring
    // inside). The gate pins the FIXED splitmix64 codebook variant
    // (m=4, ksub=4) so encode's per-subspace argmin, the query LUT,
    // and the ADC sum are all DuckDB-rendered bit-for-bit — including
    // the adc double itself: unlike cosine there is no division or
    // sqrt, just +,-,* in pinned order. Production trains codebooks
    // (PqModel.train → pqTopKAuto); recall is spec'd on planted
    // clusters.
    "q_embed_pq" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val model = graft.functions.PqModel.fixed(dim = 64, m = 4, ksub = 4, seed = 7L)
      Similarity.pqTopK(emb, "vec_id", "embedding", k = 3, model,
          Similarity.signBucket($"embedding", 4))
        .select($"qid", $"rank".cast("long").as("rank"), $"nid", $"adc")
    },

    // int8 scalar quantization: every code byte pinned (md5 over the
    // signed values), plus two exact integer dots — the self dot and
    // the dot against vec 0's codes (the candidate-scoring shape).
    // The rounding boundary floor(v·127/maxabs + 0.5) is rendered
    // operation-for-operation in the oracle.
    "q_embed_int8" -> { (s, dir) =>
      import s.implicits._
      import graft.functions.Int8
      val emb = Tables.load(s, dir, "embeddings")
      val coded = emb.select($"vec_id", Int8.int8Codes($"embedding").as("c"))
      val q0 = coded.filter($"vec_id" === 0L).select($"c".as("qc"))
      coded.crossJoin(broadcast(q0))
        .select($"vec_id",
          md5(array_join($"c".cast("array<string>"), ",")).as("codes_md5"),
          Int8.int8Dot($"c", $"c").as("self_dot"),
          Int8.int8Dot($"c", $"qc").as("dot0"))
    },

    // MMR diversified re-rank over int8 codes: greedy top-5 at λ=0.7
    // in EXACT long arithmetic (rel = int8 dot vs the query, diversity
    // = int8 dot between candidates), modulo-bucket candidate sets so
    // the whole greedy recursion unrolls in a DuckDB recursive CTE.
    // Differential liveness: picks diverge from the pure-relevance
    // top-5 (the diversity term flips later ranks)
    "q_embed_mmr" -> { (s, dir) =>
      import s.implicits._
      import graft.functions.{Int8, Mmr}
      val emb = Tables.load(s, dir, "embeddings")
      val coded = emb.select($"vec_id", Int8.int8Codes($"embedding").as("c"))
      val q = coded.filter($"vec_id" % 20 === 0)
        .select($"vec_id".as("qid"), $"c".as("qc"))
      val cands = coded.join(q,
          coded("vec_id") % 5 === q("qid") % 5 && coded("vec_id") =!= q("qid"))
        .select($"qid", $"vec_id".as("nid"),
          Int8.int8Dot($"c", $"qc").as("rel"), $"c")
      Mmr.mmrRerank(cands, "qid", "nid", "rel", "c", 5, 700)
        .select($"qid", $"rank".cast("long").as("rank"), $"nid", $"rel")
    },

    // IVF ANN with deterministic seed centroids (no Lloyd iterations in
    // the gate so the coarse quantizer is SQL-expressible): broadcast
    // centroid assignment, nprobe-cell candidate search, exact in-cell
    // rank. Rank-only output for oracle float parity.
    "q_embed_ivf" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.ivfTopK(emb, "vec_id", "embedding", k = 3,
          nlist = 16, nprobe = 2, iterations = 0)
        .select($"qid", $"rank".cast("long").as("rank"), $"nid")
    },

    // IVF-PQ (IVFADC): q_embed_ivf's coarse quantizer outside, m-byte
    // PQ codes + fused direct ADC inside — the billion-vector layout.
    // Same pinned fixed codebook as q_embed_pq, so the adc double
    // itself is oracle-exact (+,-,* in pinned order); production
    // trains codebooks and sizes nlist (ivfPqTopKAuto).
    "q_embed_ivfpq" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val model = graft.functions.PqModel.fixed(dim = 64, m = 4, ksub = 4, seed = 7L)
      Similarity.ivfPqTopK(emb, "vec_id", "embedding", k = 3, model,
          nlist = 16, nprobe = 2, iterations = 0)
        .select($"qid", $"rank".cast("long").as("rank"), $"nid", $"adc")
    },

    // Random-hyperplane LSH-bucketed ANN. Oracled via DuckDB
    // UBIGINT/HUGEINT splitmix64 (split 64×64 multiply mod 2^64) and an
    // ordered list_reduce dot-product fold that reproduces the Scala
    // loop's double-addition order bit-for-bit.
    "q_embed_lsh" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.lshTopK(emb, "vec_id", "embedding", k = 3, bits = 4)
        .select($"qid", $"rank".cast("long").as("rank"), $"nid")
    },

    // IVF with two Lloyd refinement iterations — the full coarse
    // quantizer. The oracle unrolls both assign+re-mean rounds as CTEs
    // (fixed iteration count needs no recursion). Rank-only output.
    "q_embed_ivf2" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.ivfTopK(emb, "vec_id", "embedding", k = 3,
          nlist = 16, nprobe = 2, iterations = 2)
        .select($"qid", $"rank".cast("long").as("rank"), $"nid")
    },

    // label-aware hard-negative mining over the IVF candidate set:
    // the known positives (here rendered as every same-label pair —
    // real pipelines pass curated (query, positive) training pairs)
    // are anti-joined out BEFORE the rank, then the top-3 highest-
    // cosine survivors per query are the DPR-style near-miss
    // negatives. Rank-only output for oracle float parity; the
    // iterations=0 coarse quantizer keeps the candidate set
    // SQL-expressible (q_embed_ivf precedent).
    "q_embed_hardneg" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val cands = Similarity.ivfCandidates(emb, "vec_id", "embedding",
        nlist = 16, nprobe = 2, iterations = 0)
      val lbl = emb.select($"vec_id", $"label")
      val pos = lbl.as("a").join(lbl.as("b"),
          $"a.label" === $"b.label" && $"a.vec_id" =!= $"b.vec_id")
        .select($"a.vec_id".as("qid"), $"b.vec_id".as("nid"))
      Similarity.hardNegatives(cands, pos, k = 3)
        .select($"qid", $"rank".cast("long").as("rank"), $"nid")
    },

    // ANN serving recall measured the production way: a sampled query
    // set (2% of vectors), the exact top-3 from the linear
    // |sample|·N brute force, the approximate ranking from the
    // persisted-index serving path (frozen seed centroids + cell
    // assignment), and per-query hit counts in EXACT integers — the
    // recall fraction is n_hit / n_exact, left unreduced so the
    // relation hash-compares cross-engine.
    "q_ann_recall" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter($"vec_id" % 50 === 0)
      val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding",
        nlist = 16, iterations = 0)
      val cells = Similarity.ivfAssign(emb, "vec_id", "embedding", cents)
      val approx = Similarity.ivfQueryIndex(queries, "vec_id", "embedding",
        cents, cells, nprobe = 2, k = 3)
      val exact = Similarity.bruteForceTopK(queries, emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 3)
      Similarity.annRecall(approx.select($"qid", $"nid"),
        exact.select($"qid", $"nid"))
    },

    // cluster cards over the k-means cells: per-cluster size +
    // dominant label with its count — the clustering-purity report in
    // exact integers (q_embed_ivf's frozen-seed assignment face, so
    // the oracle renders the same cells).
    "q_cluster_cards" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding",
        nlist = 16, iterations = 0)
      val cells = Similarity.ivfAssign(emb, "vec_id", "embedding", cents)
      graft.functions.Profile.clusterCards(cells, "id", "cid",
        emb, "vec_id", $"label")
    },

    // embedding-space semantic dedup (SemDeDup-style, Abbas et al.
    // 2023): bucketed cosine near-dup pairs → connected components →
    // one canonical representative per semantic cluster. Pure
    // composition of the scale paths: sign-bucket join (no cross
    // join) + alternating-star contraction. Fixed bits=4 here keeps
    // the DuckDB oracle SQL-expressible; the production entry point
    // is Dedup.semanticDedup (corpus-sized OR-amplified buckets via
    // bucketedCosinePairsAuto — sf1-measured in SCALE.md, planted
    // near-dup recall 1.0).
    "q_embed_dedup" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val pairs = Similarity.bucketedCosinePairs(emb, "vec_id", "embedding",
        threshold = 0.3, bits = 4)
      Dedup.connectedComponents(pairs.select($"i", $"j"))
    },

    // end-to-end curation: quality gate + near-dup drop (keep lowest id)
    "q_curate" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      Dedup.curate(docs, $"doc_id", $"text", stop, minQuality = 0.4,
        n = 3, numHashes = 64, bands = 16, threshold = 0.5,
        maxBucketSize = 1000) // no-op cap (> corpus size), skew guard exercised
    },

    // PII redaction (pre-training scrub): synthetic email/IP/number
    // PII is injected deterministically per doc (the corpus itself has
    // none), then redacted with typed placeholders; the md5 digest
    // pins the full redacted text, the counts pin extraction parity.
    "q_text_pii" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val injected = concat($"text",
        lit(" reach user"), $"doc_id".cast("string"),
        lit("@mail.example.com or 10.0."), pmod($"doc_id", lit(256)).cast("string"),
        lit(".7 ref 99887766"), $"doc_id".cast("string"))
      docs.select($"doc_id",
        md5(Text.redactPii(injected)).as("digest"),
        size(regexp_extract_all(injected, lit(Text.emailPattern), lit(0))).cast("long").as("n_email"),
        size(regexp_extract_all(injected, lit(Text.ipv4Pattern), lit(0))).cast("long").as("n_ip"),
        size(regexp_extract_all(injected, lit(Text.longDigitsPattern), lit(0))).cast("long").as("n_num"))
    },

    // benchmark decontamination: docs with doc_id % 50 == 0 play the
    // held-out eval set; train docs sharing >= 3 distinct 5-grams with
    // ANY eval doc are flagged — exactly the planted near-dups that
    // cross the split (1 at sf0.01, 10 at sf0.1). n=5 because 3-gram
    // overlap is unspecific on this ~30-word vocabulary (it flagged
    // 77% of train docs at sf0.1); 5-gram space is ~30^5 so organic
    // collisions vanish. One inverted join against the benchmark-sized
    // distinct shingle set — the test-set-leakage guard at corpus
    // scale.
    "q_curate_decontam" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val evalSet = docs.filter($"doc_id" % 50 === 0)
      val train = docs.filter($"doc_id" % 50 =!= 0)
      Dedup.decontaminate(train, $"doc_id", $"text", evalSet, $"text",
        n = 5, minShared = 3)
    },

    // multi-benchmark contamination report: two held-out suites
    // (0-mod-50 and 0-mod-49 docs) against the train remainder in ONE
    // train-shingle pass — per (doc, benchmark) shared counts; a doc
    // contaminated by both suites gets two rows
    "q_decontam_report" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val train = docs.filter($"doc_id" % 50 =!= 0 && $"doc_id" % 49 =!= 0)
      Dedup.decontaminateReport(train, $"doc_id", $"text",
        Seq(("suiteA", docs.filter($"doc_id" % 50 === 0), $"text"),
          ("suiteB", docs.filter($"doc_id" % 49 === 0), $"text")),
        n = 5)
    },

    // canonical normalization: case/punct/digit/whitespace noise is
    // injected deterministically (the corpus itself is already clean,
    // which would make the gate vacuous), then every doc's normalized
    // form is pinned by md5 + length — lower → punct→space → digit
    // fold → whitespace collapse → trim, explicit ASCII classes so
    // Java regex and RE2 agree byte-for-byte
    "q_text_normalize" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val noisy = docs.select($"doc_id",
        concat(when($"doc_id" % 3 === 0, upper($"text")).otherwise($"text"),
          lit(",  [Sec-9] done!  ")).as("text"))
      noisy.select($"doc_id",
        md5(Text.normalize($"text", foldDigits = true)).as("norm_md5"),
        length(Text.normalize($"text", foldDigits = true)).cast("long").as("n_chars"))
    },

    // host + registrable-domain extraction: six deterministic URL
    // shapes exercising the heuristic's branches — www subdomain
    // (last-2), generic-slot-under-ccTLD (last-3: amazon.co.uk,
    // b.gov.cn), single-label passthrough, bare 2-label, userinfo
    // strip, the hostless-but-schemed NULL (shape 5 — malformed
    // 'http://?a=1' must quarantine, never key an empty host), and
    // the non-URL NULL; oracle hand-derives host and domain per
    // shape (independent of the regex pipeline)
    "q_text_url_domain" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val raw = docs.select($"doc_id",
        when($"doc_id" % 7 === 0, lit("https://WWW.Example.COM/x"))
          .when($"doc_id" % 7 === 1,
            lit("http://Shop.Amazon.co.uk:8080/p"))
          .when($"doc_id" % 7 === 2, lit("https://a.b.GOV.cn/"))
          .when($"doc_id" % 7 === 3, lit("http://localhost:8080/"))
          .when($"doc_id" % 7 === 4,
            lit("https://u:p@x.example.org?q=1"))
          .when($"doc_id" % 7 === 5, lit("http://?a=1"))
          .otherwise(concat(lit("doc "), $"doc_id")).as("url"))
      raw.select($"doc_id", Text.urlHost($"url").as("host"),
        Text.urlDomain($"url").as("domain"))
    },

    // registry-exact registrable domain against a caller-supplied
    // mini-PSL: eleven deterministic shapes exercising every rule
    // form — exact match (com), multi-label (co.uk, pinned lowercase
    // via a duplicate uppercase rule line), the private-section
    // heuristic disagreement (foo.github.io is registrable under the
    // github.io rule where the heuristic answers github.io), wildcard
    // (*.ck), exception-beats-wildcard (!www.ck), suffix-only hosts →
    // NULL (both exact github.io and wildcard b.ck forms), a 5-label
    // private-section rule (s3.dualstack.<region>.amazonaws style —
    // the depth the 4-label bound used to silently miss), the
    // no-match heuristic fallback, and the hostless/non-URL NULLs.
    // The oracle hand-derives the expected domain per shape.
    "q_text_url_psl" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val psl = Seq("com", "CO.UK", "co.uk", "github.io", "*.ck",
        "!www.ck", "s3.dualstack.ap-northeast-1.amazonaws.com")
        .toDF("rule")
      val raw = docs.select($"doc_id",
        when($"doc_id" % 11 === 0, lit("https://A.Example.COM/x"))
          .when($"doc_id" % 11 === 1,
            lit("http://Shop.Amazon.co.uk:8080/p"))
          .when($"doc_id" % 11 === 2, lit("https://foo.GitHub.io/"))
          .when($"doc_id" % 11 === 3, lit("https://x.a.b.ck/"))
          .when($"doc_id" % 11 === 4, lit("http://WWW.ck/x"))
          .when($"doc_id" % 11 === 5, lit("https://GitHub.io/"))
          .when($"doc_id" % 11 === 6, lit(
            "https://bucket.s3.dualstack.ap-northeast-1.amazonaws.com/k"))
          .when($"doc_id" % 11 === 7,
            lit("https://u:p@x.example.org?q=1"))
          .when($"doc_id" % 11 === 8, lit("http://?a=1"))
          .when($"doc_id" % 11 === 9, lit("http://b.ck/"))
          .otherwise(concat(lit("doc "), $"doc_id")).as("url"))
      Text.urlDomainPsl(raw, $"url", psl, out = "domain")
        .select($"doc_id", $"domain")
    },

    // Flesch–Kincaid readability per doc: regex-run counts with
    // explicit ASCII classes (Java/RE2 byte parity) + two exact
    // integer floor divisions in micro-units; punctuation injected
    // deterministically on doc_id%4==0 rows so the sentence count and
    // the s=0→1 clamp are both differentially live
    "q_text_readability" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val txt = when($"doc_id" % 4 === 0,
          concat($"text", lit(". Done! Right?")))
        .otherwise($"text")
      docs.select($"doc_id", Text.readability(txt).as("r"))
        .select($"doc_id", $"r.words", $"r.sentences", $"r.syllables",
          $"r.fk_micro")
    },

    // canonical URL normalization: six deterministic raw-URL shapes
    // built from doc columns — uppercase scheme/host + default port +
    // tracking params + fragment (0), userinfo + default https port
    // (1), kept non-default port + stripped fbclid + duplicate-key
    // sort (2), trailing empty param (3), empty path + fragment on a
    // non-http scheme whose :2121 must SURVIVE (4), a hostless-but-
    // schemed input that must map to NULL, not 'https:///…' (5), and
    // a non-URL that must map to NULL (6). The oracle hand-derives
    // the expected canonical string PER SHAPE (independent
    // derivation — not a re-run of the same regex pipeline), so
    // every normalization rule is pinned by value
    "q_text_url" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val raw = docs.select($"doc_id", $"source",
        when($"doc_id" % 7 === 0, concat(
            lit("HTTP://WWW.Example.COM:80/a/"), $"doc_id",
            lit("?utm_source=x&b=2&a=1#frag")))
          .when($"doc_id" % 7 === 1,
            concat(lit("https://User:Pw@Example.com:443/p/"), $"doc_id"))
          .when($"doc_id" % 7 === 2, concat(
            lit("https://CDN.example.com:8443/img?z=9&y=2&fbclid="),
            $"doc_id", lit("&y=10")))
          .when($"doc_id" % 7 === 3, concat(
            lit("http://example.com/"), $"source", lit("/x?q="),
            $"doc_id", lit("&")))
          .when($"doc_id" % 7 === 4,
            lit("ftp://Files.example.org:2121#top"))
          .when($"doc_id" % 7 === 5,
            concat(lit("https:///x/"), $"doc_id"))
          .otherwise(concat(lit("doc "), $"doc_id")).as("url"))
      raw.select($"doc_id", Text.urlNormalize($"url").as("url_norm"))
    },

    // novelty / memorization-risk scoring: the score face of
    // decontamination — per train doc, distinct 5-grams and how many
    // the held-out reference already contains. The Bloom prefilter +
    // exact verify produce the EXACT counts (false positives die on
    // the left-join null), so the oracle is the plain n-gram join.
    "q_text_novelty" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      Dedup.noveltyStats(docs.filter($"doc_id" % 50 =!= 0), $"doc_id", $"text",
        docs.filter($"doc_id" % 50 === 0), $"text", n = 5)
    },

    // incremental corpus maintenance: new drop (doc_id%3==0) vs kept
    // history — pairs touching the drop, never old×old re-verification
    "q_dedup_incremental" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      Dedup.minhashLshPairsIncremental(
        docs.filter($"doc_id" % 3 === 0), docs.filter($"doc_id" % 3 =!= 0),
        $"doc_id", $"text", n = 3, numHashes = 64, bands = 16,
        threshold = 0.5, maxBucketSize = 1000)
    },

    // corpus-maintenance capstone: a new drop (pool doc_id%3==0)
    // deduped against kept history via the incremental pair path
    // (keeper rule: new×new drops the higher id, new×old always drops
    // the new doc — history wins), then Bloom-decontaminated against
    // the eval split. Composes this round's operators end-to-end
    // under ONE oracle.
    "q_maintain" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val pool = docs.filter($"doc_id" % 50 =!= 0)
      val evalSet = docs.filter($"doc_id" % 50 === 0)
      val newD = pool.filter($"doc_id" % 3 === 0)
      val oldD = pool.filter($"doc_id" % 3 =!= 0)
      val pairs = Dedup.minhashLshPairsIncremental(newD, oldD, $"doc_id", $"text",
        n = 3, numHashes = 64, bands = 16, threshold = 0.5)
      val isNew = (c: Column) => c % 3 === 0
      val dropped = pairs.select(
        when(isNew($"i") && isNew($"j"), $"j")
          .when(isNew($"i"), $"i").otherwise($"j").as("d")).distinct()
      val contaminated = Dedup.decontaminateBloom(newD, $"doc_id", $"text",
        evalSet, $"text", n = 5, minShared = 3).select($"id".as("c"))
      newD.join(dropped, $"doc_id" === $"d", "left_anti")
        .join(contaminated, $"doc_id" === $"c", "left_anti")
        .select($"doc_id", $"n_chars")
    },

    // HLL sketch: the full 2^8-register array rendered bit-exactly in
    // DuckDB (splitmix64 bucketing + bin()-length leading zeros), not
    // just an estimate — distinct users per event type
    "q_hll" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      val sk = ev.groupBy($"event_type")
        .agg(Hll.hllSketch(Sampling.splitmix64($"user_id"), p = 8).as("sk"))
      val regs = Hll.hllRegisters($"sk")
      sk.select($"event_type",
        md5(array_join(regs.cast("array<string>"), ",")).as("regs_md5"),
        aggregate(regs, lit(0L), (a, x) => a + x.cast("long")).as("reg_sum"),
        size(filter(regs, _ === 0)).cast("long").as("n_zero"))
    },

    // HyperBall reachability sketches at radius 2 on the symmetrized
    // co-order graph: TWO full rounds of per-node ball growth pinned
    // REGISTER-BY-REGISTER — the oracle re-derives every node's
    // radius-2 incoming-ball sketch from splitmix64 hashes and two
    // max-merge rounds over (self ∪ in-neighbors), so a missed
    // contributor, a wrong rho, or a round off-by-one moves some
    // node's md5. The harmonic-centrality face rides these counters
    // (its delta/t fold is spec-pinned; the ln-based estimates are
    // engine-local, the q_text_lm precedent)
    "q_graph_reach" -> { (s, dir) =>
      import s.implicits._
      val o = Tables.load(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey")
      val l = Tables.load(s, dir, "lineitem")
        .select($"l_orderkey", $"l_suppkey")
      val half = o.join(l, $"o_orderkey" === $"l_orderkey")
        .select($"o_custkey".as("src"),
          ($"l_suppkey" + lit(1000000L)).as("dst")).distinct()
      val edges = half.union(
        half.select($"dst".as("src"), $"src".as("dst")))
      val sk = graft.functions.Graph.reachabilitySketches(edges,
        radius = 2, p = 8)
      val regs = Hll.hllRegisters($"sk")
      sk.select($"id",
        md5(array_join(regs.cast("array<string>"), ",")).as("regs_md5"),
        aggregate(regs, lit(0L), (a, x) => a + x.cast("long")).as("reg_sum"),
        size(filter(regs, _ === 0)).cast("long").as("n_zero"))
    },

    // sketch mergeability: per-day partial sketches unioned by
    // hll_merge must be register-identical to the direct whole-group
    // sketch (max is associative) — the oracle computes the direct
    // registers once
    "q_hll_merge" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      val daily = ev
        .groupBy($"event_type", dayofmonth($"ts").as("d"))
        .agg(Hll.hllSketch(Sampling.splitmix64($"user_id"), p = 8).as("sk"))
      daily.groupBy($"event_type")
        .agg(Hll.hllMerge($"sk").as("sk"))
        .select($"event_type",
          md5(array_join(Hll.hllRegisters($"sk").cast("array<string>"), ","))
            .as("regs_md5"))
    },

    // same contract through the Bloom-prefiltered path: identical
    // oracle (exactness must survive the probabilistic prefilter)
    "q_curate_decontam_bloom" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val evalSet = docs.filter($"doc_id" % 50 === 0)
      val train = docs.filter($"doc_id" % 50 =!= 0)
      Dedup.decontaminateBloom(train, $"doc_id", $"text", evalSet, $"text",
        n = 5, minShared = 3)
    },

    // dedup observability: the cluster-SIZE histogram (how much mass
    // sits in how-big duplicate families, incl. the singleton row) —
    // what a pipeline owner reads to pick caps and keeper rules
    "q_dedup_report" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, $"doc_id", $"text",
        n = 3, threshold = 0.5)
      val cc = Dedup.connectedComponents(pairs.select($"i", $"j"))
      val hist = cc.groupBy($"rep").agg(count(lit(1)).as("cluster_size"))
        .groupBy($"cluster_size").agg(count(lit(1)).as("n_clusters"))
      val singletons = docs.join(cc, docs("doc_id") === cc("id"), "left_anti")
        .agg(lit(1L).as("cluster_size"), count(lit(1)).as("n_clusters"))
      hist.unionByName(singletons)
    },

    // SEMANTIC decontamination: train embeddings (vec_id%50<>0) vs the
    // eval split (vec_id%50=0) through the cross-corpus OR-amplified
    // LSH candidate path + exact cosine verify; integer (id, n_hits)
    // output. bits=4/tables=2 for DuckDB sketch-rendering tractability
    // (the amp-gate protocol); production sizes via
    // decontaminateSemanticAuto.
    "q_curate_decontam_sem" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      Dedup.decontaminateSemantic(
        emb.filter(col("vec_id") % 50 =!= 0), "vec_id", "embedding",
        emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
        threshold = 0.3, bits = 4, tables = 2)
    },

    // duplicate-cluster assignment: near-dup pairs → connected
    // components (alternating large-star/small-star) → (id, rep =
    // component min). The oracle closes the same pair set transitively
    // with a recursive CTE — a genuinely different algorithm computing
    // the same fixpoint, so the distributed convergence loop itself is
    // hash-verified.
    "q_dedup_cluster" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, $"doc_id", $"text", n = 3,
        threshold = 0.5, maxDocFreq = 1000)
      Dedup.connectedComponents(pairs.select($"i", $"j"))
    },

    // leakage-safe train/val/test split: membership is a pure hash of
    // the DUP-CLUSTER representative (un-clustered docs are their own
    // group), so near-duplicates can never straddle a split — the
    // eval-contamination failure of row-level randomSplit. Composes
    // the q_dedup_cluster CC fixpoint with the q_sample threshold
    // arithmetic; 80/10/10 sums to 1, so 'test' is the catch-all arm.
    "q_split_cluster" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, $"doc_id", $"text", n = 3,
        threshold = 0.5, maxDocFreq = 1000)
      val cc = Dedup.connectedComponents(pairs.select($"i", $"j"))
      val grouped = docs.select($"doc_id")
        .join(cc, docs("doc_id") === cc("id"), "left")
        .select($"doc_id", coalesce($"rep", $"doc_id").as("grp"))
      Sampling.groupSplit(grouped, $"grp",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = 13L)
    },

    // curation with the transitively-closed keeper rule: quality gate →
    // near-dup pairs → connected components → keep each cluster's min.
    // Differs from q_curate exactly where transitivity matters (docs
    // that only share a dup partner still collapse into one cluster).
    "q_curate_cluster" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      Dedup.curateClustered(docs, $"doc_id", $"text", stop, minQuality = 0.4,
        n = 3, numHashes = 64, bands = 16, threshold = 0.5,
        maxBucketSize = 1000)
    },

    // curation with the keep-BEST canonical rule: same clusters as
    // q_curate_cluster, but each cluster keeps its highest-QUALITY
    // member (ties → lowest id) instead of the lowest id — the
    // production rule (keep the best copy of a duplicated page, not
    // whichever crawled first). Differs from q_curate_cluster exactly
    // where a cluster's best-scoring member is not its min id.
    "q_curate_best" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      Dedup.curateClusteredBest(docs, $"doc_id", $"text", stop,
        minQuality = 0.4, n = 3, numHashes = 64, bands = 16,
        threshold = 0.5, maxBucketSize = 1000)
    },

    // The capstone: a complete curation pipeline in one query —
    // PII scrub → held-out benchmark split → quality gate → exact
    // dedup (keep lowest id; provably no-op on this dup-free corpus
    // but in-plan) → MinHash near-dup clusters keep-rep → benchmark
    // decontamination. Every stage's semantics are individually
    // hash-proven by its own gate; this one proves the COMPOSITION
    // end-to-end against a single composed DuckDB oracle. The
    // injected PII tail is fixed (not doc-unique) so identical docs
    // stay identical through the scrub.
    "q_curate_full" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val injected = docs.select($"doc_id",
        concat($"text", lit(" contact user@mail.example.com for removal")).as("text"))
      val evalSet = injected.filter($"doc_id" % 50 === 0)
      val train = injected.filter($"doc_id" % 50 =!= 0)
      Dedup.curateFull(train, $"doc_id", $"text", evalSet, $"text",
        stop, minQuality = 0.4, n = 3, numHashes = 64, bands = 16,
        threshold = 0.5, decontamN = 5, decontamMinShared = 3,
        maxBucketSize = 1000)
    },

    // multimodal: binary payload → per-partition codec featurization
    "q_multimodal" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select($"doc_id", $"text".cast("binary").as("blob"))
      Multimodal.featurize(docs, "doc_id", "blob").toDF()
    },

    // byte-gradient dHash per asset: every signature bit pinned (the
    // perceptual-hash construction over the stub codec's byte stream)
    "q_multimodal_dhash" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select($"doc_id", $"text".cast("binary").as("blob"))
      docs.select($"doc_id".as("asset_id"),
        Multimodal.dhash($"blob", 49).as("dh"))
    },

    // asset near-dup pairs at Hamming <= 6 through the pigeonhole
    // join; oracle is the brute-force xor-popcount join — pigeonhole
    // recall is exact by construction, so the sets must be identical
    "q_multimodal_neardup" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select($"doc_id", $"text".cast("binary").as("blob"))
      Multimodal.nearDupAssets(docs, "doc_id", "blob",
          target = 49, maxHamming = 6)
        .select($"i", $"j", $"hamming".cast("long").as("hamming"))
    },

    // multimodal resize: stride-downsample each blob to <= 48 bytes;
    // the oracle recomputes the exact sampled byte positions
    "q_multimodal_resize" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select($"doc_id", $"text".cast("binary").as("blob"))
      Multimodal.resize(docs, "doc_id", "blob", target = 48).toDF()
    },

    // multimodal frame sampling: 64-byte frames, keep every 3rd —
    // flatMap fan-out so per-frame work parallelizes corpus-wide
    "q_multimodal_frames" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select($"doc_id", $"text".cast("binary").as("blob"))
      Multimodal.frameSample(docs, "doc_id", "blob",
        frameSize = 64, everyNth = 3).toDF()
    })

  /** DuckDB rendering of [[Similarity.signBucket]] with bits=4 —
    * shared with the SearchQueries hybrid gate via [[OracleSql]].
    */
  private val signBucketSql = OracleSql.signBucket(4)

  /** DuckDB rendering of the fixed-codebook PQ gate
    * ([[graft.functions.PqModel.fixed]] m=4, ksub=4, dim=64, seed=7):
    * codebook values inlined as shortest-round-trip double literals
    * (strtod parses them back to the identical bits), encode's
    * squared-L2 folds and the ADC dot chains rendered as explicit
    * left-associative term chains so every double matches the Scala
    * loops bit-for-bit — no list_reduce, no division, no sqrt.
    */
  /** Shared renderers for the fixed-codebook PQ oracles
    * ([[graft.functions.PqModel.fixed]] m=4, ksub=4, dim=64, seed=7):
    * `codes` encodes alias `v`'s embedding (per-subspace first-minimum
    * argmin over explicit squared-L2 term chains), `adc` dots alias
    * `q`'s embedding against alias `n`'s code columns `c0..c{m-1}`.
    * Both are left-associative +,-,* chains matching the Scala folds
    * bit-for-bit — no list_reduce, no division, no sqrt. Double
    * literals use EXPONENT notation, not Double.toString: DuckDB
    * parses a bare decimal literal as DECIMAL and its cast to DOUBLE
    * double-rounds (int128 → double, then ÷10^scale — measured 1 ulp
    * off); an e-notation literal goes straight through strtod,
    * bit-exact. The `adc` chain is the oracle twin of BOTH
    * [[graft.functions.AdcScoreExpr]] (direct form) and lut+adc_dot —
    * the two are bit-identical by the shared per-subspace fold shape
    * (spec-pinned in FunctionsSpec).
    */
  private object PqSql {
    private val model = graft.functions.PqModel.fixed(dim = 64, m = 4, ksub = 4, seed = 7L)
    private val m = model.m; private val ksub = model.ksub
    private val subdim = model.subdim
    private def dbl(x: Double) = f"($x%.17e)"
    private def e(pfx: String, i: Int) = s"CAST($pfx.embedding[${i + 1}] AS DOUBLE)"
    // squared-L2 of subspace s against code c: Scala's dist += t*t fold
    private def dist(s: Int, c: Int) = (0 until subdim).map { d =>
      val x = e("v", s * subdim + d); val cd = dbl(model.centroid(s, c, d))
      s"(($x - $cd) * ($x - $cd))"
    }.mkString(" + ")
    // first-minimum argmin (ties -> lowest code), as in PqImpl.encode
    private def code(s: Int) = {
      val ds = (0 until ksub).map(c => dist(s, c))
      val whens = (0 until ksub - 1).map { c =>
        val leqs = ((c + 1) until ksub).map(o => s"(${ds(c)}) <= (${ds(o)})").mkString(" AND ")
        s"WHEN $leqs THEN $c"
      }.mkString(" ")
      s"(CASE $whens ELSE ${ksub - 1} END)"
    }
    // lut[s][c] = dot(q_sub_s, codebook[s][c]): Scala's dot += q*c fold
    private def qdot(s: Int, c: Int) = (0 until subdim).map { d =>
      s"(${e("q", s * subdim + d)} * ${dbl(model.centroid(s, c, d))})"
    }.mkString(" + ")
    private def pick(s: Int) = {
      val whens = (0 until ksub).map(c => s"WHEN $c THEN (${qdot(s, c)})").mkString(" ")
      s"(CASE n.c$s $whens END)"
    }
    val adc: String = (0 until m).map(pick).mkString(" + ")
    val codes: String = (0 until m).map(s => s"${code(s)} AS c$s").mkString(", ")
  }

  private def pqAdcSql: String =
    s"""WITH v AS (SELECT vec_id, embedding, $signBucketSql AS bucket FROM embeddings),
       |enc AS (SELECT vec_id, bucket, ${PqSql.codes} FROM v),
       |pairs AS (
       |  SELECT q.vec_id AS qid, n.vec_id AS nid, ${PqSql.adc} AS adc
       |  FROM v q JOIN enc n ON q.bucket = n.bucket AND q.vec_id <> n.vec_id)
       |SELECT qid, rank, nid, adc FROM (
       |  SELECT qid, nid, adc,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc DESC, nid ASC) AS rank
       |  FROM pairs) WHERE rank <= 3""".stripMargin

  /** [[pqAdcSql]]'s ADC scoring under [[q_embed_ivf]]'s coarse
    * quantizer: seed centroids (16 lowest ids, 0 Lloyd iterations so
    * the quantizer is SQL-expressible), corpus = each vector's rn = 1
    * cell PQ-encoded, queries probe rn ≤ 2 cells with the raw vector.
    */
  private def ivfPqSql: String =
    s"""WITH seeds AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
       |               FROM embeddings ORDER BY vec_id LIMIT 16),
       |asgn AS (SELECT e.vec_id AS id, e.embedding, s.cid,
       |  ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |    ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), s.cv) DESC, s.cid) AS rn
       |  FROM embeddings e, seeds s),
       |enc AS (SELECT v.id AS nid, v.cid, ${PqSql.codes}
       |        FROM (SELECT id, embedding, cid FROM asgn WHERE rn = 1) v),
       |probes AS (SELECT id AS qid, embedding, cid FROM asgn WHERE rn <= 2),
       |pairs AS (
       |  SELECT q.qid, n.nid, ${PqSql.adc} AS adc
       |  FROM probes q JOIN enc n ON q.cid = n.cid AND q.qid <> n.nid)
       |SELECT qid, rank, nid, adc FROM (
       |  SELECT qid, nid, adc,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc DESC, nid ASC) AS rank
       |  FROM pairs) WHERE rank <= 3""".stripMargin

  private val ntok = "len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))"
  private val nalpha = "length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))"
  private def hits(words: Seq[String]) =
    s"len(list_filter(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''), t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"

  /** Shared tail for the skew gate: ~10 words → 8 shingles with
    * df = corpus size, guaranteed over any reasonable cap.
    */
  private val boilerplate =
    "terms of service apply to every document in this corpus"

  /** Replacement text for the MinHash skew gate's degenerate group: the
    * 60 docs carrying it are bit-identical, so they share every band
    * bucket.
    */
  private val skewText =
    "all rights reserved unauthorized reproduction of this archive is strictly prohibited"

  /** [[Text.bpePattern]] as a DuckDB string literal (RE2 and Java
    * regex agree on this lookahead-free ASCII pattern; leftmost-first
    * alternation order is identical).
    */
  private val bpePatternSql = "'" + Text.bpePattern.replace("'", "''") + "'"

  /** DuckDB rendering of [[graft.functions.WinnowImpl]]: per k-gram a
    * wrapping base-257 fold in UBIGINT (the 128-bit intermediate fits
    * HUGEINT because the base is small), window minima via a ROWS
    * frame under native UBIGINT (= unsigned) order — matching the
    * implementation's compareUnsigned deque — then recentered to the
    * signed 64-bit output. Docs with fewer grams than a window keep
    * row 1, whose truncated frame spans the whole doc (the
    * implementation's whole-doc-window branch).
    */
  private def winnowFpSql(k: Int, w: Int, src: String = "documents"): String =
    s"""tok0 AS (SELECT doc_id, text FROM $src WHERE length(text) >= $k),
       |grams AS (
       |  SELECT doc_id, t.i AS i,
       |    list_reduce(
       |      list_prepend(0::UBIGINT, list_transform(range(t.i, t.i + $k),
       |        j -> CAST(unicode(text[j]) AS UBIGINT))),
       |      (h, c) -> CAST((CAST(h AS HUGEINT) * ${graft.functions.WinnowImpl.Base} + c) % $M64 AS UBIGINT)) AS h
       |  FROM tok0, UNNEST(generate_series(1, length(text) - $k + 1)) t(i)),
       |wins AS (
       |  SELECT doc_id, i,
       |    MIN(h) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS wm,
       |    COUNT(*) OVER (PARTITION BY doc_id) AS m
       |  FROM grams),
       |fps AS (
       |  SELECT DISTINCT doc_id,
       |    CAST(CASE WHEN wm >= 9223372036854775808::UBIGINT
       |         THEN CAST(wm AS HUGEINT) - $M64 ELSE CAST(wm AS HUGEINT) END AS BIGINT) AS fp
       |  FROM wins WHERE i <= GREATEST(m - $w + 1, 1))""".stripMargin

  /** Recursive-CTE transitive closure over a preceding `good(i, j)`
    * pair CTE: `reach` enumerates every (node, reachable node), so
    * `MIN(r) GROUP BY id` is the component representative — the oracle
    * for [[graft.functions.Dedup.connectedComponents]], computed by a
    * genuinely different algorithm (BFS closure vs alternating
    * star-contraction) reaching the same fixpoint.
    */
  private val componentsSql =
    """edges AS (SELECT i AS u, j AS v FROM good UNION SELECT j AS u, i AS v FROM good),
      |reach(id, r) AS (
      |  SELECT u, u FROM edges
      |  UNION
      |  SELECT x.id, e.v FROM reach x JOIN edges e ON e.u = x.r)""".stripMargin

  /** 2^64 as a DuckDB literal (HUGEINT context). */
  private val M64 = "18446744073709551616"

  /** DuckDB rendering of a wrapping 64×64→64-bit multiply `z * c mod
    * 2^64`. A direct HUGEINT multiply can overflow 128 bits, so split:
    * z·c ≡ (z_lo·c + ((z_hi·c mod 2^32) << 32)) mod 2^64, every term
    * < 2^97. `z` must be a UBIGINT-valued SQL expression, `c` an
    * unsigned 64-bit constant.
    */
  private def mul64(z: String, c: BigInt): String =
    s"CAST(((CAST($z % 4294967296 AS HUGEINT) * $c) + " +
      s"((((CAST($z AS HUGEINT) // 4294967296) * $c) % 4294967296) * 4294967296)) " +
      s"% $M64 AS UBIGINT)"

  /** DuckDB rendering of the splitmix64 finalizer over a UBIGINT
    * expression `z0` (the sampling membership hash —
    * [[graft.functions.SamplingImpl.splitmix64]]). Returns a UBIGINT
    * SQL expression. Wrapping multiplies via [[mul64]].
    */
  private def smix64Sql(z0: String): String = {
    val c1 = BigInt("9e3779b97f4a7c15", 16)
    val c2 = BigInt("bf58476d1ce4e5b9", 16)
    val c3 = BigInt("94d049bb133111eb", 16)
    val za = s"CAST((CAST($z0 AS HUGEINT) + $c1) % $M64 AS UBIGINT)"
    val zb = mul64(s"xor($za, $za >> 30)", c2)
    val zc = mul64(s"xor($zb, $zb >> 27)", c3)
    s"xor($zc, $zc >> 31)"
  }

  /** DuckDB rendering of the full 2^8-register HLL sketch over
    * `splitmix64(user_id)` per event_type ([[graft.functions.HllImpl]]):
    * idx = top 8 bits, w = h·2^8 mod 2^64, rho = 57 when w=0 else
    * 65 − length(bin(w)) (bin() drops leading zeros, so its length is
    * the MSB position — integer-exact leading-zero count). The grid
    * cross join restores empty registers as 0.
    */
  private def hllRegSql: String = {
    val h = smix64Sql("CAST(user_id AS UBIGINT)")
    s"""WITH b AS (SELECT event_type, CAST(($h) >> 56 AS BIGINT) AS idx,
       |  CAST((CAST(($h) AS HUGEINT) * 256) % 18446744073709551616 AS UBIGINT) AS w
       |  FROM events),
       |r0 AS (SELECT event_type, idx,
       |    MAX(CASE WHEN w = 0 THEN 57 ELSE 65 - length(bin(w)) END) AS reg
       |  FROM b GROUP BY 1, 2),
       |grid AS (SELECT DISTINCT event_type FROM events),
       |regs AS (SELECT g.event_type, i.idx, COALESCE(r0.reg, 0) AS reg
       |  FROM grid g CROSS JOIN (SELECT UNNEST(generate_series(0, 255)) AS idx) i
       |  LEFT JOIN r0 ON r0.event_type = g.event_type AND r0.idx = i.idx)
       |""".stripMargin
  }

  /** The sampling gates' membership test: keep iff
    * `splitmix64(id ⊕ salt) >> 1 < threshold` (thresholds inlined by
    * the Scala side's exact `rate · 2⁶³` rounding).
    */
  private def sampleKeepSql(salt: Long, thresholdLit: String): String =
    s"(${smix64Sql(s"xor(CAST(doc_id AS UBIGINT), ${salt}::UBIGINT)")} >> 1) < $thresholdLit"

  /** DuckDB rendering of [[graft.functions.SimHashImpl]]: FNV-1a 64 per
    * token as an ordered `list_reduce` fold in UBIGINT (xor/shift) with
    * the wrapping multiply in HUGEINT, then per-bit majority votes.
    * Text is ASCII (proven by q_multimodal's byte oracle), so
    * `unicode(t[i])` is the UTF-8 byte.
    */
  private val simhashPairsSql =
    s"""WITH tok AS (
       |  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS ts
       |  FROM documents),
       |tk AS (SELECT doc_id, UNNEST(ts) AS t FROM tok),
       |th AS (
       |  SELECT doc_id,
       |    list_reduce(
       |      list_prepend(14695981039346656037::UBIGINT,
       |        list_transform(range(1, length(t)+1), i -> CAST(unicode(t[i]) AS UBIGINT))),
       |      (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211) % $M64 AS UBIGINT)
       |    ) AS h
       |  FROM tk),
       |votes AS (
       |  SELECT doc_id, bb.b AS b,
       |    SUM(CAST((h >> bb.b) & 1 AS BIGINT)) AS nset, COUNT(*) AS n
       |  FROM th, (SELECT UNNEST(range(0, 64)) AS b) bb
       |  GROUP BY doc_id, bb.b),
       |sims0 AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN 2*nset > n THEN (1::UBIGINT << CAST(b AS INT)) ELSE 0::UBIGINT END) AS UBIGINT) AS sim
       |  FROM votes GROUP BY doc_id),
       |sims AS (
       |  SELECT t.doc_id, COALESCE(s.sim, 0::UBIGINT) AS sim
       |  FROM tok t LEFT JOIN sims0 s ON t.doc_id = s.doc_id)
       |SELECT a.doc_id AS i, b.doc_id AS j,
       |  CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
       |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sim, b.sim)) <= 7""".stripMargin

  /** DuckDB rendering of [[graft.functions.LshBucketImpl]]: splitmix64
    * per (dim, bit) seed via [[mul64]], ±1 hyperplanes from the parity,
    * and the per-bit dot product as an ordered `list_reduce` fold —
    * double additions happen in exactly the Scala loop's order, so the
    * sign (= the bucket bit) is bit-for-bit reproducible. Ranking
    * mirrors the sign-bucket gate's rank-only oracle.
    */
  private val lshTopKSql = {
    val c1 = BigInt("9e3779b97f4a7c15", 16) // splitmix64 golden-gamma add
    val c2 = BigInt("bf58476d1ce4e5b9", 16) // mix multiplier 1
    val c3 = BigInt("94d049bb133111eb", 16) // mix multiplier 2
    s"""WITH dims AS (SELECT MAX(len(embedding)) AS nd FROM embeddings),
       |seeds AS (
       |  SELECT bb.b AS b, ii.i AS i,
       |    CAST((CAST(ii.i*31 + bb.b AS HUGEINT) + $c1) % $M64 AS UBIGINT) AS z
       |  FROM (SELECT UNNEST(range(0, 4)) AS b) bb,
       |       (SELECT UNNEST(range(0, (SELECT nd FROM dims))) AS i) ii),
       |p1 AS (SELECT b, i, ${mul64("xor(z, z >> 30)", c2)} AS z FROM seeds),
       |p2 AS (SELECT b, i, ${mul64("xor(z, z >> 27)", c3)} AS z FROM p1),
       |pf AS (SELECT b, i, xor(z, z >> 31) AS z FROM p2),
       |planes AS (
       |  SELECT b, list(CASE WHEN z % 2 = 0 THEN 1.0 ELSE -1.0 END ORDER BY i) AS sgn
       |  FROM pf GROUP BY b),
       |dots AS (
       |  SELECT e.vec_id, p.b,
       |    list_reduce(
       |      list_prepend(0.0, list_transform(range(1, len(e.embedding)+1),
       |        i -> CAST(e.embedding[i] AS DOUBLE) * p.sgn[i])),
       |      (a, x) -> a + x) AS dot
       |  FROM embeddings e, planes p),
       |buckets AS (
       |  SELECT vec_id,
       |    SUM(CASE WHEN dot >= 0 THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END) AS bkt
       |  FROM dots GROUP BY vec_id)
       |SELECT a.vec_id AS qid,
       |  ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |    ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) DESC, b.vec_id) AS rank,
       |  b.vec_id AS nid
       |FROM (SELECT e.vec_id, e.embedding, k.bkt FROM embeddings e JOIN buckets k USING (vec_id)) a
       |JOIN (SELECT e.vec_id, e.embedding, k.bkt FROM embeddings e JOIN buckets k USING (vec_id)) b
       |  ON a.bkt = b.bkt AND a.vec_id <> b.vec_id
       |QUALIFY rank <= 3""".stripMargin
  }

  /** [[lshTopKSql]]'s splitmix64 machinery generalized to the
    * multi-table sketch ([[graft.functions.LshBucketImpl]] `signT`):
    * plane index (t<<32)|(i<<8)|b (= t·2³² + i·256 + b — the fields
    * never overlap), 2 tables × 4 bits; candidates are DISTINCT
    * same-(table, bucket) pairs, exact-cosine-verified at the
    * threshold. Every per-table bucket assignment is pinned pair-wise:
    * a colocation disagreement in either engine changes the row set.
    */
  private val amplifiedPairsSql = {
    val c1 = BigInt("9e3779b97f4a7c15", 16) // splitmix64 golden-gamma add
    val c2 = BigInt("bf58476d1ce4e5b9", 16) // mix multiplier 1
    val c3 = BigInt("94d049bb133111eb", 16) // mix multiplier 2
    s"""WITH dims AS (SELECT MAX(len(embedding)) AS nd FROM embeddings),
       |seeds AS (
       |  SELECT tt.t AS t, bb.b AS b, ii.i AS i,
       |    CAST((CAST(tt.t AS HUGEINT) * 4294967296 + ii.i * 256 + bb.b + $c1) % $M64 AS UBIGINT) AS z
       |  FROM (SELECT UNNEST(range(0, 2)) AS t) tt,
       |       (SELECT UNNEST(range(0, 4)) AS b) bb,
       |       (SELECT UNNEST(range(0, (SELECT nd FROM dims))) AS i) ii),
       |p1 AS (SELECT t, b, i, ${mul64("xor(z, z >> 30)", c2)} AS z FROM seeds),
       |p2 AS (SELECT t, b, i, ${mul64("xor(z, z >> 27)", c3)} AS z FROM p1),
       |pf AS (SELECT t, b, i, xor(z, z >> 31) AS z FROM p2),
       |planes AS (
       |  SELECT t, b, list(CASE WHEN z % 2 = 0 THEN 1.0 ELSE -1.0 END ORDER BY i) AS sgn
       |  FROM pf GROUP BY t, b),
       |dots AS (
       |  SELECT e.vec_id, p.t, p.b,
       |    list_reduce(
       |      list_prepend(0.0, list_transform(range(1, len(e.embedding)+1),
       |        i -> CAST(e.embedding[i] AS DOUBLE) * p.sgn[i])),
       |      (a, x) -> a + x) AS dot
       |  FROM embeddings e, planes p),
       |buckets AS (
       |  SELECT vec_id, t,
       |    SUM(CASE WHEN dot >= 0 THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END) AS bkt
       |  FROM dots GROUP BY vec_id, t),
       |cands AS (SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
       |  FROM buckets a JOIN buckets b
       |    ON a.t = b.t AND a.bkt = b.bkt AND a.vec_id < b.vec_id)
       |SELECT c.i, c.j
       |FROM cands c
       |JOIN embeddings ea ON ea.vec_id = c.i
       |JOIN embeddings eb ON eb.vec_id = c.j
       |WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])) >= 0.3""".stripMargin
  }

  /** Cross-corpus (train × eval) variant of [[amplifiedPairsSql]]'s
    * sketch rendering: same splitmix64 plane family, candidates join
    * train buckets to eval buckets (never within a side), exact
    * cosine verify, grouped to integer (id, n_hits).
    */
  private val decontamSemSql = {
    val c1 = BigInt("9e3779b97f4a7c15", 16)
    val c2 = BigInt("bf58476d1ce4e5b9", 16)
    val c3 = BigInt("94d049bb133111eb", 16)
    s"""WITH dims AS (SELECT MAX(len(embedding)) AS nd FROM embeddings),
       |seeds AS (
       |  SELECT tt.t AS t, bb.b AS b, ii.i AS i,
       |    CAST((CAST(tt.t AS HUGEINT) * 4294967296 + ii.i * 256 + bb.b + $c1) % $M64 AS UBIGINT) AS z
       |  FROM (SELECT UNNEST(range(0, 2)) AS t) tt,
       |       (SELECT UNNEST(range(0, 4)) AS b) bb,
       |       (SELECT UNNEST(range(0, (SELECT nd FROM dims))) AS i) ii),
       |p1 AS (SELECT t, b, i, ${mul64("xor(z, z >> 30)", c2)} AS z FROM seeds),
       |p2 AS (SELECT t, b, i, ${mul64("xor(z, z >> 27)", c3)} AS z FROM p1),
       |pf AS (SELECT t, b, i, xor(z, z >> 31) AS z FROM p2),
       |planes AS (
       |  SELECT t, b, list(CASE WHEN z % 2 = 0 THEN 1.0 ELSE -1.0 END ORDER BY i) AS sgn
       |  FROM pf GROUP BY t, b),
       |dots AS (
       |  SELECT e.vec_id, p.t, p.b,
       |    list_reduce(
       |      list_prepend(0.0, list_transform(range(1, len(e.embedding)+1),
       |        i -> CAST(e.embedding[i] AS DOUBLE) * p.sgn[i])),
       |      (a, x) -> a + x) AS dot
       |  FROM embeddings e, planes p),
       |buckets AS (
       |  SELECT vec_id, t,
       |    SUM(CASE WHEN dot >= 0 THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END) AS bkt
       |  FROM dots GROUP BY vec_id, t),
       |cands AS (SELECT DISTINCT tr.vec_id AS id, ev.vec_id AS eid
       |  FROM buckets tr JOIN buckets ev ON tr.t = ev.t AND tr.bkt = ev.bkt
       |  WHERE tr.vec_id % 50 <> 0 AND ev.vec_id % 50 = 0)
       |SELECT c.id, COUNT(*) AS n_hits
       |FROM cands c
       |JOIN embeddings ea ON ea.vec_id = c.id
       |JOIN embeddings eb ON eb.vec_id = c.eid
       |WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])) >= 0.3
       |GROUP BY c.id""".stripMargin
  }

  private val int8Sql =
    """WITH m AS (SELECT vec_id, embedding,
      |  COALESCE(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 0) AS maxabs
      |  FROM embeddings),
      |codes AS (SELECT vec_id,
      |  CASE WHEN maxabs = 0
      |       THEN list_transform(embedding, x -> 0::BIGINT)
      |       ELSE list_transform(embedding, x -> CAST(
      |         LEAST(GREATEST(floor((CAST(x AS DOUBLE) * 127.0) / maxabs + 0.5), -127), 127)
      |         AS BIGINT)) END AS c
      |  FROM m),
      |q0 AS (SELECT c AS qc FROM codes WHERE vec_id = 0)
      |SELECT codes.vec_id,
      |  md5(array_to_string(list_transform(c, x -> CAST(x AS VARCHAR)), ',')) AS codes_md5,
      |  CAST(list_sum(list_transform(c, x -> x * x)) AS BIGINT) AS self_dot,
      |  CAST(list_sum(list_transform(range(1, len(c) + 1), i -> c[i] * qc[i])) AS BIGINT) AS dot0
      |FROM codes, q0""".stripMargin

  private val mmrSql =
    """WITH RECURSIVE m AS (SELECT vec_id, embedding,
      |  COALESCE(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 0) AS maxabs
      |  FROM embeddings),
      |codes AS (SELECT vec_id,
      |  CASE WHEN maxabs = 0
      |       THEN list_transform(embedding, x -> 0::BIGINT)
      |       ELSE list_transform(embedding, x -> CAST(
      |         LEAST(GREATEST(floor((CAST(x AS DOUBLE) * 127.0) / maxabs + 0.5), -127), 127)
      |         AS BIGINT)) END AS c
      |  FROM m),
      |q AS (SELECT vec_id AS qid, c AS qc FROM codes WHERE vec_id % 20 = 0),
      |cand AS (SELECT q.qid, co.vec_id AS id, co.c AS v,
      |    CAST(list_sum(list_transform(range(1, len(co.c) + 1), i -> co.c[i] * q.qc[i])) AS BIGINT) AS rel
      |  FROM q JOIN codes co ON co.vec_id % 5 = q.qid % 5 AND co.vec_id <> q.qid),
      |sel AS (
      |  SELECT qid, 0 AS step, CAST([] AS BIGINT[]) AS picked
      |  FROM (SELECT DISTINCT qid FROM cand)
      |  UNION ALL
      |  SELECT s.qid, s.step + 1, list_append(s.picked, (
      |      SELECT c.id FROM cand c
      |      WHERE c.qid = s.qid AND NOT list_contains(s.picked, c.id)
      |      ORDER BY 700 * c.rel - 300 * COALESCE((SELECT max(CAST(list_sum(
      |            list_transform(range(1, len(c.v) + 1), i -> c.v[i] * c2.v[i])) AS BIGINT))
      |          FROM cand c2 WHERE c2.qid = s.qid AND list_contains(s.picked, c2.id)), 0) DESC,
      |        c.id ASC
      |      LIMIT 1))
      |  FROM sel s WHERE s.step < 5),
      |fin AS (SELECT qid, picked FROM sel WHERE step = 5),
      |ranked AS (SELECT qid, CAST(i AS BIGINT) AS rank, picked[i] AS id
      |  FROM fin, unnest(generate_series(1, 5)) AS t(i))
      |SELECT r.qid, r.rank, r.id AS nid, c.rel
      |FROM ranked r JOIN cand c ON c.qid = r.qid AND c.id = r.id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_source_filter" ->
      s"""WITH st AS (SELECT source, count(*) AS n,
         |    CAST(SUM($ntok) AS BIGINT) AS tok,
         |    CAST(SUM($nalpha) AS BIGINT) AS alpha,
         |    CAST(SUM(length(text)) AS BIGINT) AS len
         |  FROM documents GROUP BY 1),
         |pass AS (SELECT source FROM st
         |  WHERE tok >= 54 * n AND alpha * 1000 >= 800 * len)
         |SELECT d.doc_id, d.source
         |FROM documents d JOIN pass USING (source)""".stripMargin,
    "q_embed_mmr" -> mmrSql,
    "q_dedup_simhash" -> simhashPairsSql,
    "q_curate_decontam_sem" -> decontamSemSql,
    "q_embed_int8" -> int8Sql,
    "q_embed_lsh" -> lshTopKSql,
    "q_embed_pairs_amp" -> amplifiedPairsSql,
    "q_embed_pq" -> pqAdcSql,
    "q_embed_ivfpq" -> ivfPqSql,
    "q_text_stats" ->
      s"""SELECT doc_id, $ntok AS n_tokens, $nalpha AS n_alpha,
         |  CAST(list_sum(list_transform(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''), t -> length(t))) AS BIGINT) AS checksum
         |FROM documents""".stripMargin,
    "q_text_quality" ->
      s"""SELECT doc_id,
         |  0.5 * (CAST(${hits(stop)} AS DOUBLE) / GREATEST(CAST($ntok AS DOUBLE), 1.0))
         |  + 0.3 * (CAST($nalpha AS DOUBLE) / GREATEST(CAST(length(text) AS DOUBLE), 1.0))
         |  + 0.2 * (LEAST(CAST($ntok AS DOUBLE), 100.0) / 100.0) AS quality
         |FROM documents""".stripMargin,
    "q_text_pack" ->
      s"""SELECT doc_id AS id, doc_id % 8 AS bucket,
         |  CAST(floor(CAST(cum_before AS DOUBLE) / 512) AS BIGINT) AS pack,
         |  CAST(n_tokens AS BIGINT) AS n_tokens
         |FROM (SELECT doc_id, n_tokens,
         |  COALESCE(SUM(n_tokens) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         |  FROM (SELECT doc_id, $ntok AS n_tokens FROM documents))""".stripMargin,
    "q_text_batch" ->
      s"""WITH t AS (SELECT doc_id, CAST($ntok AS BIGINT) AS n_tokens FROM documents),
         |a AS (SELECT doc_id, n_tokens, n_tokens // 16 AS bin,
         |  (ROW_NUMBER() OVER (PARTITION BY n_tokens // 16
         |     ORDER BY n_tokens, doc_id) - 1) // 8 AS batch
         |  FROM t)
         |SELECT bin, batch, COUNT(*) AS n_docs, MAX(n_tokens) AS max_tokens,
         |  CAST(MAX(n_tokens) * COUNT(*) - SUM(n_tokens) AS BIGINT) AS pad_tokens
         |FROM a GROUP BY 1, 2""".stripMargin,
    "q_sample" ->
      s"""SELECT doc_id FROM documents
         |WHERE ${sampleKeepSql(7L, s"${Sampling.threshold(0.25)}::UBIGINT")}""".stripMargin,
    "q_sample_mix" ->
      s"""WITH t AS (SELECT source, SUM(n_chars) AS tt FROM documents GROUP BY 1),
         |s AS (SELECT doc_id, d.source, n_chars, tt,
         |  CASE WHEN d.source = 'src0' THEN 400
         |       WHEN d.source = 'src1' THEN 100 ELSE 20 END AS pm
         |FROM documents d JOIN t ON d.source = t.source)
         |SELECT doc_id, source, n_chars FROM s
         |WHERE CAST((${smix64Sql("xor(CAST(doc_id AS UBIGINT), 11::UBIGINT)")}) >> 1 AS HUGEINT)
         |    * 1000 * CAST(tt AS HUGEINT)
         |  < CAST(pm AS HUGEINT) * 50000
         |    * 9223372036854775808::HUGEINT""".stripMargin,
    "q_sample_weighted" ->
      s"""SELECT doc_id, n_chars FROM documents
         |WHERE CAST((${smix64Sql("xor(CAST(doc_id AS UBIGINT), 7::UBIGINT)")}) >> 1 AS HUGEINT)
         |    * 8192
         |  < CAST(LEAST(GREATEST(n_chars, 0), 8192) AS HUGEINT)
         |    * 9223372036854775808::HUGEINT""".stripMargin,
    "q_sample_dsir" -> {
      // FNV-1a 64 over the space-joined bigram (ASCII text — the
      // simhash oracle's byte argument), top 63 bits mod 128
      val fnv = s"""list_reduce(
         |      list_prepend(14695981039346656037::UBIGINT,
         |        list_transform(range(1, length(s)+1), i -> CAST(unicode(s[i]) AS UBIGINT))),
         |      (h, c) -> CAST((CAST(xor(h, c) AS HUGEINT) * 1099511628211) % $M64 AS UBIGINT))""".stripMargin
      s"""WITH tok AS (SELECT doc_id, source,
         |    list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS w
         |  FROM documents),
         |g AS (SELECT doc_id, source, w[i] || ' ' || w[i+1] AS s
         |  FROM tok, UNNEST(generate_series(1, len(w)-1)) t(i)),
         |gb AS (SELECT doc_id, source,
         |    CAST((($fnv) >> 1) % 128 AS BIGINT) AS b FROM g),
         |ct AS (SELECT b, COUNT(*) AS c FROM gb WHERE source = 'src0' GROUP BY 1),
         |cr AS (SELECT b, COUNT(*) AS c FROM gb GROUP BY 1),
         |tot AS (SELECT
         |    (SELECT CAST(COALESCE(SUM(c),0) AS HUGEINT) FROM ct) + 128 AS tb,
         |    (SELECT CAST(COALESCE(SUM(c),0) AS HUGEINT) FROM cr) + 128 AS rb),
         |ratio AS (SELECT gs.b AS b,
         |    LEAST((1000000::HUGEINT * (COALESCE(ct.c,0)+1) * rb)
         |        // ((COALESCE(cr.c,0)+1) * tb),
         |      1000000000::HUGEINT) AS rmu
         |  FROM (SELECT UNNEST(generate_series(0, 127)) AS b) gs
         |  LEFT JOIN ct ON ct.b = gs.b LEFT JOIN cr ON cr.b = gs.b, tot),
         |wt AS (SELECT doc_id, CAST(SUM(r.rmu) // COUNT(*) AS BIGINT) AS w
         |  FROM gb JOIN ratio r ON r.b = gb.b GROUP BY 1),
         |allw AS (SELECT d.doc_id, COALESCE(wt.w, 1000000) AS ir_w
         |  FROM documents d LEFT JOIN wt ON wt.doc_id = d.doc_id)
         |SELECT doc_id, ir_w FROM allw
         |WHERE CAST((${smix64Sql("xor(CAST(doc_id AS UBIGINT), 13::UBIGINT)")}) >> 1 AS HUGEINT)
         |    * 2000000
         |  < CAST(LEAST(GREATEST(ir_w, 0), 2000000) AS HUGEINT)
         |    * 9223372036854775808::HUGEINT""".stripMargin
    },

    // the ELSE (default rate 1.0) renders as TRUE, matching the Scala
    // side's endpoint short-circuit — not a `< 2⁶³` comparison, which
    // under strict `<` on the clamped MaxValue would drop the two ids
    // whose hash tops out
    "q_sample_strat" ->
      s"""SELECT doc_id, CAST(doc_id % 3 AS VARCHAR) AS stratum FROM documents
         |WHERE (CASE CAST(doc_id % 3 AS VARCHAR)
         | WHEN '1' THEN ${sampleKeepSql(7L, s"${Sampling.threshold(0.5)}::UBIGINT")}
         | WHEN '0' THEN ${sampleKeepSql(7L, s"${Sampling.threshold(0.1)}::UBIGINT")}
         | ELSE TRUE END)""".stripMargin,
    "q_sample_take" ->
      s"""SELECT doc_id, stratum FROM (
         |  SELECT doc_id, CAST(doc_id % 3 AS VARCHAR) AS stratum,
         |    ROW_NUMBER() OVER (PARTITION BY CAST(doc_id % 3 AS VARCHAR)
         |      ORDER BY (${smix64Sql("xor(CAST(doc_id AS UBIGINT), 7::UBIGINT)")} >> 1),
         |        doc_id) AS r
         |  FROM documents) WHERE r <= 40""".stripMargin,
    "q_sample_cluster" ->
      s"""WITH seeds AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
         |               FROM embeddings ORDER BY vec_id LIMIT 16),
         |asgn AS (SELECT e.vec_id AS id, s.cid,
         |  ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |    ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), s.cv) DESC, s.cid) AS rn
         |  FROM embeddings e, seeds s),
         |cells AS (SELECT id, cid FROM asgn WHERE rn = 1)
         |SELECT id, cid FROM (
         |  SELECT id, cid, ROW_NUMBER() OVER (PARTITION BY cid
         |    ORDER BY (${smix64Sql("xor(CAST(id AS UBIGINT), 7::UBIGINT)")} >> 1), id) AS r
         |  FROM cells) WHERE r <= 5""".stripMargin,
    // the 63-bit key makes UBIGINT mod/order here agree with the Scala
    // side's signed-long mod/order for any shard count; doc_id breaks
    // key ties so ROW_NUMBER is deterministic
    "q_shuffle_shard" ->
      s"""SELECT doc_id, CAST(k % 8 AS BIGINT) AS shard,
         |  ROW_NUMBER() OVER (PARTITION BY k % 8 ORDER BY k, doc_id) - 1 AS pos
         |FROM (SELECT doc_id,
         |  (${smix64Sql("xor(CAST(doc_id AS UBIGINT), 7::UBIGINT)")} >> 1) AS k
         |  FROM documents)""".stripMargin,
    "q_text_pack_asm" ->
      s"""SELECT bucket, pack,
         |  string_agg(text, ' ' ORDER BY doc_id) AS seq_text,
         |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         |FROM (SELECT doc_id, text, doc_id % 8 AS bucket,
         |  CAST(floor(CAST(cum_before AS DOUBLE) / 512) AS BIGINT) AS pack, n_tokens
         |  FROM (SELECT doc_id, text, n_tokens,
         |    COALESCE(SUM(n_tokens) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         |    FROM (SELECT doc_id, text, $ntok AS n_tokens FROM documents)))
         |GROUP BY bucket, pack""".stripMargin,
    "q_text_langid" -> {
      val langs = Text.langStopwords
      val caseArms = langs.zipWithIndex.map { case ((lang, sw), i) =>
        val h = s"h_$lang"
        val others = langs.filter(_._1 != lang).map(l => s"h_${l._1}")
        s"WHEN $h > 0 AND ${others.map(o => s"$h >= $o").mkString(" AND ")} THEN '$lang'"
      }.mkString("\n  ")
      val hitCols = langs.map { case (lang, sw) => s"${hits(sw)} AS h_$lang" }.mkString(", ")
      s"""SELECT doc_id, CASE
         |  $caseArms
         |  ELSE 'unknown' END AS lang_guess
         |FROM (SELECT doc_id, $hitCols FROM documents)""".stripMargin
    },
    "q_text_repetition" ->
      """WITH tok AS (SELECT doc_id,
        |  list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS w FROM documents),
        |g AS (SELECT doc_id,
        |  CASE WHEN len(w) >= 2
        |       THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
        |       ELSE [] END AS g2,
        |  CASE WHEN len(w) >= 3
        |       THEN list_transform(range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |       ELSE [] END AS g3
        |FROM tok)
        |SELECT doc_id,
        |  CAST(len(g2) AS BIGINT) AS n_2grams,
        |  CAST(len(list_distinct(g2)) AS BIGINT) AS d_2grams,
        |  CAST(COALESCE(list_max(list_transform(list_distinct(g2),
        |    x -> len(list_filter(g2, y -> y = x)))), 0) AS BIGINT) AS top_2gram,
        |  CASE WHEN len(g2) = 0 THEN 0.0
        |       ELSE CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / CAST(len(g2) AS DOUBLE)
        |       END AS dup_2gram_ratio,
        |  CASE WHEN len(g3) = 0 THEN 0.0
        |       ELSE CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / CAST(len(g3) AS DOUBLE)
        |       END AS dup_3gram_ratio,
        |  CASE WHEN len(g2) = 0 THEN 0.0
        |       ELSE CAST(COALESCE(list_max(list_transform(list_distinct(g2),
        |         x -> len(list_filter(g2, y -> y = x)))), 0) AS DOUBLE) / CAST(len(g2) AS DOUBLE)
        |       END AS top_2gram_frac
        |FROM g""".stripMargin,
    "q_text_lm" ->
      """WITH tok AS (SELECT doc_id,
        |  list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS w FROM documents),
        |train AS (SELECT * FROM tok WHERE doc_id % 2 = 0),
        |uni AS (SELECT t, COUNT(*) AS c1 FROM (SELECT UNNEST(w) AS t FROM train) GROUP BY t),
        |bi AS (SELECT p, t, COUNT(*) AS c2 FROM (
        |  SELECT w[i] AS p, w[i+1] AS t FROM train, UNNEST(generate_series(1, len(w)-1)) r(i))
        |  GROUP BY p, t),
        |pos AS (SELECT doc_id, w[i] AS p, w[i+1] AS t
        |  FROM tok, UNNEST(generate_series(1, len(w)-1)) r(i)),
        |j AS (SELECT doc_id, bi.c2, up.c1 AS c1p, ut.c1 AS c1t FROM pos
        |  LEFT JOIN bi ON pos.p = bi.p AND pos.t = bi.t
        |  LEFT JOIN uni up ON pos.p = up.t
        |  LEFT JOIN uni ut ON pos.t = ut.t)
        |SELECT doc_id AS id, COUNT(*) AS n_scored,
        |  CAST(SUM(CASE WHEN c2 IS NOT NULL AND c1p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |  CAST(SUM(CASE WHEN c2 IS NOT NULL AND c1p IS NOT NULL THEN c2 ELSE 0 END) AS BIGINT) AS sum_c2,
        |  CAST(SUM(CASE WHEN c2 IS NOT NULL AND c1p IS NOT NULL THEN c1p ELSE 0 END) AS BIGINT) AS sum_c1prev,
        |  CAST(SUM(CASE WHEN c2 IS NOT NULL AND c1p IS NOT NULL THEN 0 ELSE COALESCE(c1t, 0) END) AS BIGINT) AS sum_c1backoff
        |FROM j GROUP BY doc_id""".stripMargin,
    "q_text_classify" ->
      """WITH tok AS (SELECT doc_id, lang,
        |  list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS w FROM documents),
        |train AS (SELECT lang AS label, w FROM tok WHERE doc_id % 2 = 0),
        |words AS (SELECT label, t, COUNT(*) AS c FROM (
        |  SELECT label, UNNEST(w) AS t FROM train) GROUP BY label, t),
        |cls AS (SELECT label, COUNT(*) AS n_docs,
        |  CAST(COALESCE(SUM(len(w)), 0) AS BIGINT) AS n_tok FROM train GROUP BY label),
        |tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM (
        |  SELECT doc_id, UNNEST(w) AS t FROM tok) GROUP BY doc_id, t),
        |j AS (SELECT tf.doc_id, cls.label, tf.tf, words.c, cls.n_docs, cls.n_tok
        |  FROM tf CROSS JOIN cls
        |  LEFT JOIN words ON words.label = cls.label AND words.t = tf.t)
        |SELECT doc_id AS id, label,
        |  CAST(SUM(tf) AS BIGINT) AS n_pos,
        |  CAST(SUM(CASE WHEN c IS NOT NULL THEN tf ELSE 0 END) AS BIGINT) AS n_hit,
        |  CAST(SUM(tf * COALESCE(c, 0)) AS BIGINT) AS sum_c,
        |  CAST(ANY_VALUE(n_docs) AS BIGINT) AS class_docs,
        |  CAST(ANY_VALUE(n_tok) AS BIGINT) AS class_tok
        |FROM j GROUP BY doc_id, label""".stripMargin,
    // every rule re-derived in exact integer arithmetic — the same
    // per-mille comparisons as Text.gopherRules, no doubles anywhere
    "q_text_gopher" ->
      """WITH tok AS (SELECT doc_id, text,
        |  list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS w FROM documents),
        |s AS (SELECT doc_id,
        |  CAST(len(w) AS BIGINT) AS ntok,
        |  CAST(COALESCE(list_sum(list_transform(w, t -> length(t))), 0) AS BIGINT) AS lensum,
        |  CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS nalpha,
        |  CAST(len(list_filter(w, t -> t IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS nhits,
        |  CASE WHEN len(w) >= 2
        |       THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
        |       ELSE [] END AS g2
        |FROM tok),
        |r AS (SELECT doc_id, ntok, lensum, nalpha, nhits,
        |  CAST(len(g2) AS BIGINT) AS n2,
        |  CAST(len(list_distinct(g2)) AS BIGINT) AS d2,
        |  CAST(COALESCE(list_max(list_transform(list_distinct(g2),
        |    x -> len(list_filter(g2, y -> y = x)))), 0) AS BIGINT) AS top2
        |FROM s)
        |SELECT doc_id,
        |  (ntok >= 20 AND ntok <= 100000) AS ok_word_count,
        |  (lensum * 1000 >= ntok * 4000 AND lensum * 1000 <= ntok * 10000) AS ok_mean_word_len,
        |  (nalpha * 1000 >= lensum * 800) AS ok_alpha,
        |  (nhits >= 2) AS ok_stopwords,
        |  ((n2 - d2) * 1000 <= n2 * 100) AS ok_dup_2gram,
        |  (top2 * 1000 <= n2 * 100) AS ok_top_2gram,
        |  ((ntok >= 20 AND ntok <= 100000)
        |    AND (lensum * 1000 >= ntok * 4000 AND lensum * 1000 <= ntok * 10000)
        |    AND (nalpha * 1000 >= lensum * 800)
        |    AND (nhits >= 2)
        |    AND ((n2 - d2) * 1000 <= n2 * 100)
        |    AND (top2 * 1000 <= n2 * 100)) AS keep
        |FROM r""".stripMargin,
    "q_quality_report" ->
      """WITH tok AS (SELECT doc_id, source, text,
        |  list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS w FROM documents),
        |s AS (SELECT doc_id, source,
        |  CAST(len(w) AS BIGINT) AS ntok,
        |  CAST(COALESCE(list_sum(list_transform(w, t -> length(t))), 0) AS BIGINT) AS lensum,
        |  CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS nalpha,
        |  CAST(len(list_filter(w, t -> t IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS nhits,
        |  CASE WHEN len(w) >= 2
        |       THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
        |       ELSE [] END AS g2
        |FROM tok),
        |r AS (SELECT doc_id, source, ntok, lensum, nalpha, nhits,
        |  CAST(len(g2) AS BIGINT) AS n2,
        |  CAST(len(list_distinct(g2)) AS BIGINT) AS d2,
        |  CAST(COALESCE(list_max(list_transform(list_distinct(g2),
        |    x -> len(list_filter(g2, y -> y = x)))), 0) AS BIGINT) AS top2
        |FROM s),
        |f AS (SELECT source,
        |  (ntok >= 20 AND ntok <= 100000) AS ok_w,
        |  (lensum * 1000 >= ntok * 4000 AND lensum * 1000 <= ntok * 10000) AS ok_m,
        |  (nalpha * 1000 >= lensum * 800) AS ok_a,
        |  (nhits >= 2) AS ok_s,
        |  ((n2 - d2) * 1000 <= n2 * 100) AS ok_d,
        |  (top2 * 1000 <= n2 * 100) AS ok_t
        |FROM r)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN ok_w AND ok_m AND ok_a AND ok_s AND ok_d AND ok_t THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
        |  CAST(SUM(CASE WHEN ok_w THEN 0 ELSE 1 END) AS BIGINT) AS n_fail_words,
        |  CAST(SUM(CASE WHEN ok_m THEN 0 ELSE 1 END) AS BIGINT) AS n_fail_mean,
        |  CAST(SUM(CASE WHEN ok_a THEN 0 ELSE 1 END) AS BIGINT) AS n_fail_alpha,
        |  CAST(SUM(CASE WHEN ok_s THEN 0 ELSE 1 END) AS BIGINT) AS n_fail_stop,
        |  CAST(SUM(CASE WHEN ok_d THEN 0 ELSE 1 END) AS BIGINT) AS n_fail_dup2,
        |  CAST(SUM(CASE WHEN ok_t THEN 0 ELSE 1 END) AS BIGINT) AS n_fail_top2
        |FROM f GROUP BY source""".stripMargin,
    "q_text_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |FROM documents""".stripMargin,
    "q_text_pii" -> {
      val email = Text.emailPattern.replace("'", "''")
      val ip = Text.ipv4Pattern
      val num = Text.longDigitsPattern
      s"""WITH inj AS (SELECT doc_id,
         |  text || ' reach user' || doc_id || '@mail.example.com or 10.0.' ||
         |  (doc_id % 256) || '.7 ref 99887766' || doc_id AS injected
         |FROM documents)
         |SELECT doc_id,
         |  md5(regexp_replace(regexp_replace(regexp_replace(injected,
         |    '$email', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'), '$num', '<NUM>', 'g')) AS digest,
         |  CAST(len(regexp_extract_all(injected, '$email')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(injected, '$ip')) AS BIGINT) AS n_ip,
         |  CAST(len(regexp_extract_all(injected, '$num')) AS BIGINT) AS n_num
         |FROM inj""".stripMargin
    },
    "q_curate_decontam" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS s
        |  FROM tok, UNNEST(generate_series(1, len(w)-4)) t(i))),
        |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
        |tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0)
        |SELECT doc_id AS id, COUNT(*) AS n_shared
        |FROM tr JOIN ev USING (s)
        |GROUP BY 1 HAVING COUNT(*) >= 3""".stripMargin,
    "q_decontam_report" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS s
        |  FROM tok, UNNEST(generate_series(1, len(w)-4)) t(i))),
        |ev AS (
        |  SELECT DISTINCT 'suiteA' AS benchmark, s FROM sh WHERE doc_id % 50 = 0
        |  UNION ALL
        |  SELECT DISTINCT 'suiteB', s FROM sh WHERE doc_id % 49 = 0),
        |tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0 AND doc_id % 49 <> 0)
        |SELECT tr.doc_id AS id, ev.benchmark, CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM tr JOIN ev USING (s)
        |GROUP BY 1, 2""".stripMargin,
    "q_text_normalize" ->
      """SELECT doc_id, md5(norm) AS norm_md5, CAST(length(norm) AS BIGINT) AS n_chars
        |FROM (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(regexp_replace(lower(
        |    (CASE WHEN doc_id % 3 = 0 THEN upper(text) ELSE text END) || ',  [Sec-9] done!  '),
        |    '[!-/:-@\[-`{-~]', ' ', 'g'), '[0-9]', '0', 'g'),
        |    '[ \t\n\r]+', ' ', 'g')) AS norm
        |FROM documents)""".stripMargin,
    "q_text_url_domain" ->
      """SELECT doc_id,
        |  CASE doc_id % 7
        |    WHEN 0 THEN 'www.example.com' WHEN 1 THEN 'shop.amazon.co.uk'
        |    WHEN 2 THEN 'a.b.gov.cn' WHEN 3 THEN 'localhost'
        |    WHEN 4 THEN 'x.example.org'
        |    WHEN 5 THEN NULL ELSE NULL END AS host,
        |  CASE doc_id % 7
        |    WHEN 0 THEN 'example.com' WHEN 1 THEN 'amazon.co.uk'
        |    WHEN 2 THEN 'b.gov.cn' WHEN 3 THEN 'localhost'
        |    WHEN 4 THEN 'example.org'
        |    WHEN 5 THEN NULL ELSE NULL END AS domain
        |FROM documents""".stripMargin,

    "q_text_url_psl" ->
      """SELECT doc_id,
        |  CASE doc_id % 11
        |    WHEN 0 THEN 'example.com'
        |    WHEN 1 THEN 'amazon.co.uk'
        |    WHEN 2 THEN 'foo.github.io'
        |    WHEN 3 THEN 'a.b.ck'
        |    WHEN 4 THEN 'www.ck'
        |    WHEN 5 THEN NULL
        |    WHEN 6 THEN 'bucket.s3.dualstack.ap-northeast-1.amazonaws.com'
        |    WHEN 7 THEN 'example.org'
        |    WHEN 8 THEN NULL
        |    WHEN 9 THEN NULL
        |    ELSE NULL END AS domain
        |FROM documents""".stripMargin,

    "q_text_readability" ->
      """WITH d AS (SELECT doc_id,
        |  CASE WHEN doc_id % 4 = 0 THEN text || '. Done! Right?'
        |       ELSE text END AS t
        |  FROM documents),
        |c AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[^ \t\n\r]+')) AS BIGINT) AS words,
        |  CAST(len(regexp_extract_all(t, '[.!?]+')) AS BIGINT) AS sentences,
        |  CAST(len(regexp_extract_all(lower(t), '[aeiouy]+')) AS BIGINT)
        |    AS syllables
        |  FROM d)
        |SELECT doc_id, words, sentences, syllables,
        |  CASE WHEN words = 0 THEN NULL
        |    ELSE (390000 * words) // GREATEST(sentences, 1)
        |      + (11800000 * syllables) // words - 15590000
        |  END AS fk_micro
        |FROM c""".stripMargin,

    "q_text_url" ->
      """SELECT doc_id, CASE doc_id % 7
        |  WHEN 0 THEN 'http://www.example.com/a/' || CAST(doc_id AS VARCHAR)
        |    || '?a=1&b=2'
        |  WHEN 1 THEN 'https://example.com/p/' || CAST(doc_id AS VARCHAR)
        |  WHEN 2 THEN 'https://cdn.example.com:8443/img?y=10&y=2&z=9'
        |  WHEN 3 THEN 'http://example.com/' || source || '/x?q='
        |    || CAST(doc_id AS VARCHAR)
        |  WHEN 4 THEN 'ftp://files.example.org:2121/'
        |  WHEN 5 THEN NULL
        |  ELSE NULL END AS url_norm
        |FROM documents""".stripMargin,
    "q_text_novelty" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS s
        |  FROM tok, UNNEST(generate_series(1, len(w)-4)) t(i))),
        |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
        |tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0)
        |SELECT tr.doc_id AS id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |  CAST(COUNT(ev.s) AS BIGINT) AS n_seen
        |FROM tr LEFT JOIN ev USING (s)
        |GROUP BY 1""".stripMargin,
    "q_hll" -> (hllRegSql +
      """SELECT event_type,
        |  md5(string_agg(CAST(reg AS VARCHAR), ',' ORDER BY idx)) AS regs_md5,
        |  CAST(SUM(reg) AS BIGINT) AS reg_sum,
        |  CAST(COUNT(*) FILTER (reg = 0) AS BIGINT) AS n_zero
        |FROM regs GROUP BY 1""".stripMargin),
    "q_hll_merge" -> (hllRegSql +
      """SELECT event_type,
        |  md5(string_agg(CAST(reg AS VARCHAR), ',' ORDER BY idx)) AS regs_md5
        |FROM regs GROUP BY 1""".stripMargin),
    "q_graph_reach" -> {
      val h = smix64Sql("CAST(id AS UBIGINT)")
      s"""WITH e0 AS (SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + 1000000 AS dst
         |            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         |edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         |nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
         |b AS (SELECT id, CAST(($h) >> 56 AS BIGINT) AS idx,
         |    CAST((CAST(($h) AS HUGEINT) * 256) % 18446744073709551616 AS UBIGINT) AS w
         |  FROM nodes),
         |r0 AS (SELECT id, idx,
         |    MAX(CASE WHEN w = 0 THEN 57 ELSE 65 - length(bin(w)) END) AS reg
         |  FROM b GROUP BY 1, 2),
         |contrib AS (SELECT id AS node, id AS src FROM nodes
         |            UNION ALL SELECT dst, src FROM edges),
         |r1 AS (SELECT c.node AS id, r.idx, MAX(r.reg) AS reg
         |  FROM contrib c JOIN r0 r ON r.id = c.src GROUP BY 1, 2),
         |r2 AS (SELECT c.node AS id, r.idx, MAX(r.reg) AS reg
         |  FROM contrib c JOIN r1 r ON r.id = c.src GROUP BY 1, 2),
         |regs AS (SELECT n.id, i.idx, COALESCE(r2.reg, 0) AS reg
         |  FROM nodes n CROSS JOIN (SELECT UNNEST(generate_series(0, 255)) AS idx) i
         |  LEFT JOIN r2 ON r2.id = n.id AND r2.idx = i.idx)
         |SELECT id,
         |  md5(string_agg(CAST(reg AS VARCHAR), ',' ORDER BY idx)) AS regs_md5,
         |  CAST(SUM(reg) AS BIGINT) AS reg_sum,
         |  CAST(COUNT(*) FILTER (reg = 0) AS BIGINT) AS n_zero
         |FROM regs GROUP BY 1""".stripMargin
    },
    "q_curate_decontam_bloom" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS s
        |  FROM tok, UNNEST(generate_series(1, len(w)-4)) t(i))),
        |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
        |tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0)
        |SELECT doc_id AS id, COUNT(*) AS n_shared
        |FROM tr JOIN ev USING (s)
        |GROUP BY 1 HAVING COUNT(*) >= 3""".stripMargin,
    "q_text_tfidf" ->
      """WITH tok AS (SELECT doc_id,
        |  UNNEST(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1)
        |SELECT doc_id, term, tf, df, rank FROM (
        |  SELECT t.doc_id, t.term, t.tf, d.df,
        |    ROW_NUMBER() OVER (PARTITION BY t.doc_id
        |      ORDER BY CAST(t.tf AS DOUBLE) / CAST(d.df + 1 AS DOUBLE) DESC, t.term) AS rank
        |  FROM tf t JOIN dfq d USING (term))
        |WHERE rank <= 3""".stripMargin,
    "q_text_bpe" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, $bpePatternSql)) AS BIGINT) AS n_bpe,
         |  md5(array_to_string(regexp_extract_all(text, $bpePatternSql), chr(1))) AS digest
         |FROM documents""".stripMargin,
    "q_text_winnow" ->
      s"""WITH ${winnowFpSql(8, 4)}
         |SELECT doc_id, fp FROM fps""".stripMargin,
    "q_dedup_winnow" ->
      s"""WITH ${winnowFpSql(16, 4)},
         |kept AS (SELECT * FROM fps WHERE fp IN (
         |  SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 1000)),
         |cnt AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS shared
         |          FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT i, j, shared,
         |  CAST(shared AS DOUBLE) / LEAST(ca.n, cb.n) AS overlap
         |FROM pairs JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
         |WHERE CAST(shared AS DOUBLE) / LEAST(ca.n, cb.n) >= 0.5""".stripMargin,
    "q_dedup_winnow_skew" ->
      s"""WITH skewdocs AS (SELECT doc_id, text || ' $boilerplate' AS text FROM documents),
         |${winnowFpSql(16, 4, "skewdocs")},
         |kept AS (SELECT * FROM fps WHERE fp IN (
         |  SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 50)),
         |cnt AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS shared
         |          FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT i, j, shared,
         |  CAST(shared AS DOUBLE) / LEAST(ca.n, cb.n) AS overlap
         |FROM pairs JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
         |WHERE CAST(shared AS DOUBLE) / LEAST(ca.n, cb.n) >= 0.4""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
        |  MIN(doc_id) AS keeper, COUNT(*) AS n
        |FROM documents GROUP BY 1""".stripMargin,
    "q_dedup_ngram" -> exactJaccardSql(0.5),
    "q_dedup_ngram_prefix" -> exactJaccardSql(0.5),
    "q_dedup_containment" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM tok, UNNEST(generate_series(1, len(w)-2)) t(i))),
        |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS inter
        |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
        |          GROUP BY 1, 2)
        |SELECT i, j, CAST(inter AS DOUBLE) / ca.n AS containment
        |FROM pairs JOIN cnt ca ON ca.doc_id = i
        |WHERE CAST(inter AS DOUBLE) / ca.n >= 0.6""".stripMargin,
    "q_text_cooc" ->
      """WITH tok AS (SELECT
        |    list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS w
        |  FROM documents),
        |pairs AS (SELECT w[i] AS x, w[i+d] AS y
        |  FROM tok, UNNEST(generate_series(1, 3)) dd(d),
        |    UNNEST(generate_series(1, len(w)-d)) t(i))
        |SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n FROM pairs
        |GROUP BY 1, 2 HAVING COUNT(*) >= 5""".stripMargin,
    "q_text_pmi" ->
      """WITH tok AS (SELECT
        |    list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS w
        |  FROM documents),
        |uni AS (SELECT UNNEST(w) AS t FROM tok),
        |cx AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS tt FROM uni),
        |bi AS (SELECT w[i] AS x, w[i+1] AS y
        |  FROM tok, UNNEST(generate_series(1, len(w)-1)) t(i)),
        |cxy AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n_xy FROM bi
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5)
        |SELECT c.x, c.y, c.n_xy, a.c AS n_x, b.c AS n_y,
        |  CAST((1000000::HUGEINT * c.n_xy * (SELECT tt FROM tot))
        |    // (CAST(a.c AS HUGEINT) * CAST(b.c AS HUGEINT)) AS BIGINT) AS lift
        |FROM cxy c JOIN cx a ON a.t = c.x JOIN cx b ON b.t = c.y""".stripMargin,
    "q_dedup_ngram_skew" -> cappedJaccardSql(0.3, 50),
    "q_curate" ->
      s"""WITH q AS (SELECT doc_id, text,
         |  0.5 * (CAST(${hits(stop)} AS DOUBLE) / GREATEST(CAST($ntok AS DOUBLE), 1.0))
         |  + 0.3 * (CAST($nalpha AS DOUBLE) / GREATEST(CAST(length(text) AS DOUBLE), 1.0))
         |  + 0.2 * (LEAST(CAST($ntok AS DOUBLE), 100.0) / 100.0) AS quality
         |FROM documents),
         |kept AS (SELECT * FROM q WHERE quality >= 0.4),
         |tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM kept),
         |sh AS (SELECT DISTINCT doc_id, s FROM (
         |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
         |  FROM tok, UNNEST(generate_series(1, len(w)-2)) t(i))),
         |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS inter
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |dup AS (SELECT DISTINCT j FROM pairs
         |        JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
         |        WHERE CAST(inter AS DOUBLE)/(ca.n + cb.n - inter) >= 0.5)
         |SELECT doc_id AS id, quality FROM kept
         |WHERE doc_id NOT IN (SELECT j FROM dup)""".stripMargin,
    "q_dedup_minhash" -> exactJaccardSql(0.5),
    "q_dedup_incremental" ->
      (exactJaccardSql(0.5) + "\n  AND (i % 3 = 0 OR j % 3 = 0)"),
    "q_maintain" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents WHERE doc_id % 50 <> 0),
        |sh3 AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM tok, UNNEST(generate_series(1, len(w)-2)) t(i))),
        |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh3 GROUP BY 1),
        |pr AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS inter
        |       FROM sh3 a JOIN sh3 b ON a.s = b.s AND a.doc_id < b.doc_id
        |       GROUP BY 1, 2),
        |pairs AS (SELECT i, j FROM pr
        |  JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
        |  WHERE CAST(inter AS DOUBLE)/(ca.n + cb.n - inter) >= 0.5
        |    AND (i % 3 = 0 OR j % 3 = 0)),
        |dropped AS (
        |  SELECT j AS d FROM pairs WHERE i % 3 = 0 AND j % 3 = 0
        |  UNION SELECT i FROM pairs WHERE i % 3 = 0 AND j % 3 <> 0
        |  UNION SELECT j FROM pairs WHERE i % 3 <> 0 AND j % 3 = 0),
        |tok5 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh5 AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS s
        |  FROM tok5, UNNEST(generate_series(1, len(w)-4)) t(i))),
        |ev AS (SELECT DISTINCT s FROM sh5 WHERE doc_id % 50 = 0),
        |contaminated AS (SELECT doc_id FROM (
        |  SELECT t.doc_id, COUNT(*) AS ns FROM sh5 t JOIN ev USING (s)
        |  WHERE t.doc_id % 50 <> 0 AND t.doc_id % 3 = 0 GROUP BY 1)
        |  WHERE ns >= 3)
        |SELECT doc_id, n_chars FROM documents
        |WHERE doc_id % 50 <> 0 AND doc_id % 3 = 0
        |  AND doc_id NOT IN (SELECT d FROM dropped)
        |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)""".stripMargin,
    "q_curate_full" -> {
      val email = Text.emailPattern.replace("'", "''")
      val ip = Text.ipv4Pattern
      val num = Text.longDigitsPattern
      s"""WITH RECURSIVE inj AS (SELECT doc_id,
         |  text || ' contact user@mail.example.com for removal' AS text FROM documents),
         |red AS (SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '$email', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'), '$num', '<NUM>', 'g') AS text
         |  FROM inj),
         |ev AS (SELECT doc_id, text FROM red WHERE doc_id % 50 = 0),
         |tr AS (SELECT doc_id, text FROM red WHERE doc_id % 50 <> 0),
         |q AS (SELECT doc_id, text,
         |  0.5 * (CAST(${hits(stop)} AS DOUBLE) / GREATEST(CAST($ntok AS DOUBLE), 1.0))
         |  + 0.3 * (CAST($nalpha AS DOUBLE) / GREATEST(CAST(length(text) AS DOUBLE), 1.0))
         |  + 0.2 * (LEAST(CAST($ntok AS DOUBLE), 100.0) / 100.0) AS quality
         |FROM tr),
         |kept AS (SELECT * FROM q WHERE quality >= 0.4),
         |keepers AS (SELECT MIN(doc_id) AS doc_id FROM kept
         |            GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))),
         |uniq AS (SELECT k.* FROM kept k JOIN keepers USING (doc_id)),
         |tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM uniq),
         |sh AS (SELECT DISTINCT doc_id, s FROM (
         |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
         |  FROM tok, UNNEST(generate_series(1, len(w)-2)) t(i))),
         |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS inter
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |good AS (SELECT i, j FROM pairs
         |         JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
         |         WHERE CAST(inter AS DOUBLE)/(ca.n + cb.n - inter) >= 0.5),
         |$componentsSql,
         |drops AS (SELECT id FROM (SELECT id, MIN(r) AS rep FROM reach GROUP BY id)
         |          WHERE id <> rep),
         |dd AS (SELECT * FROM uniq WHERE doc_id NOT IN (SELECT id FROM drops)),
         |tok5t AS (SELECT doc_id, string_split(text, ' ') AS w FROM dd),
         |sh5t AS (SELECT DISTINCT doc_id, s FROM (
         |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS s
         |  FROM tok5t, UNNEST(generate_series(1, len(w)-4)) t(i))),
         |tok5e AS (SELECT doc_id, string_split(text, ' ') AS w FROM ev),
         |sh5e AS (SELECT DISTINCT s FROM (
         |  SELECT w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS s
         |  FROM tok5e, UNNEST(generate_series(1, len(w)-4)) t(i))),
         |cont AS (SELECT doc_id FROM sh5t JOIN sh5e USING (s)
         |         GROUP BY doc_id HAVING COUNT(*) >= 3)
         |SELECT doc_id AS id, quality FROM dd
         |WHERE doc_id NOT IN (SELECT doc_id FROM cont)""".stripMargin
    },
    "q_dedup_cluster" ->
      s"""WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sh AS (SELECT DISTINCT doc_id, s FROM (
         |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
         |  FROM tok, UNNEST(generate_series(1, len(w)-2)) t(i))),
         |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS inter
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |good AS (SELECT i, j FROM pairs
         |         JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
         |         WHERE CAST(inter AS DOUBLE)/(ca.n + cb.n - inter) >= 0.5),
         |$componentsSql
         |SELECT id, MIN(r) AS rep FROM reach GROUP BY id""".stripMargin,
    "q_split_cluster" -> {
      val h = smix64Sql("xor(CAST(grp AS UBIGINT), 13::UBIGINT)")
      val t1 = Sampling.threshold(0.8)
      val t2 = Sampling.threshold(0.8 + 0.1)
      s"""WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sh AS (SELECT DISTINCT doc_id, s FROM (
         |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
         |  FROM tok, UNNEST(generate_series(1, len(w)-2)) t(i))),
         |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS inter
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |good AS (SELECT i, j FROM pairs
         |         JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
         |         WHERE CAST(inter AS DOUBLE)/(ca.n + cb.n - inter) >= 0.5),
         |$componentsSql,
         |assign AS (SELECT id, MIN(r) AS rep FROM reach GROUP BY id),
         |g AS (SELECT d.doc_id, COALESCE(a.rep, d.doc_id) AS grp
         |      FROM documents d LEFT JOIN assign a ON d.doc_id = a.id)
         |SELECT doc_id, grp,
         |  CASE WHEN ($h >> 1) < ${t1}::UBIGINT THEN 'train'
         |       WHEN ($h >> 1) < ${t2}::UBIGINT THEN 'val'
         |       ELSE 'test' END AS split
         |FROM g""".stripMargin
    },
    "q_dedup_report" ->
      s"""WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sh AS (SELECT DISTINCT doc_id, s FROM (
         |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
         |  FROM tok, UNNEST(generate_series(1, len(w)-2)) t(i))),
         |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS inter
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |good AS (SELECT i, j FROM pairs
         |         JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
         |         WHERE CAST(inter AS DOUBLE)/(ca.n + cb.n - inter) >= 0.5),
         |$componentsSql,
         |assign AS (SELECT id, MIN(r) AS rep FROM reach GROUP BY id),
         |hist AS (SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters FROM (
         |    SELECT rep, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM assign GROUP BY rep)
         |  GROUP BY cluster_size)
         |SELECT * FROM hist
         |UNION ALL
         |SELECT 1 AS cluster_size,
         |  CAST((SELECT COUNT(*) FROM documents) - (SELECT COUNT(*) FROM assign) AS BIGINT) AS n_clusters""".stripMargin,
    "q_curate_cluster" ->
      s"""WITH RECURSIVE q AS (SELECT doc_id, text,
         |  0.5 * (CAST(${hits(stop)} AS DOUBLE) / GREATEST(CAST($ntok AS DOUBLE), 1.0))
         |  + 0.3 * (CAST($nalpha AS DOUBLE) / GREATEST(CAST(length(text) AS DOUBLE), 1.0))
         |  + 0.2 * (LEAST(CAST($ntok AS DOUBLE), 100.0) / 100.0) AS quality
         |FROM documents),
         |kept AS (SELECT * FROM q WHERE quality >= 0.4),
         |tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM kept),
         |sh AS (SELECT DISTINCT doc_id, s FROM (
         |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
         |  FROM tok, UNNEST(generate_series(1, len(w)-2)) t(i))),
         |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS inter
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |good AS (SELECT i, j FROM pairs
         |         JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
         |         WHERE CAST(inter AS DOUBLE)/(ca.n + cb.n - inter) >= 0.5),
         |$componentsSql
         |SELECT doc_id AS id, quality FROM kept
         |WHERE doc_id NOT IN (
         |  SELECT id FROM (SELECT id, MIN(r) AS rep FROM reach GROUP BY id)
         |  WHERE id <> rep)""".stripMargin,
    "q_curate_best" ->
      s"""WITH RECURSIVE q AS (SELECT doc_id, text,
         |  0.5 * (CAST(${hits(stop)} AS DOUBLE) / GREATEST(CAST($ntok AS DOUBLE), 1.0))
         |  + 0.3 * (CAST($nalpha AS DOUBLE) / GREATEST(CAST(length(text) AS DOUBLE), 1.0))
         |  + 0.2 * (LEAST(CAST($ntok AS DOUBLE), 100.0) / 100.0) AS quality
         |FROM documents),
         |kept AS (SELECT * FROM q WHERE quality >= 0.4),
         |tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM kept),
         |sh AS (SELECT DISTINCT doc_id, s FROM (
         |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
         |  FROM tok, UNNEST(generate_series(1, len(w)-2)) t(i))),
         |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS inter
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |good AS (SELECT i, j FROM pairs
         |         JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
         |         WHERE CAST(inter AS DOUBLE)/(ca.n + cb.n - inter) >= 0.5),
         |$componentsSql,
         |assign AS (SELECT id, MIN(r) AS rep FROM reach GROUP BY id),
         |best AS (SELECT a.id, a.rep,
         |  ROW_NUMBER() OVER (PARTITION BY a.rep
         |    ORDER BY k.quality DESC, a.id ASC) AS rn
         |  FROM assign a JOIN kept k ON k.doc_id = a.id)
         |SELECT doc_id AS id, quality FROM kept
         |WHERE doc_id NOT IN (SELECT id FROM best WHERE rn > 1)""".stripMargin,
    "q_dedup_minhash_skew" -> cappedMinhashSql(0.5, 50),
    "q_embed_dedup" ->
      s"""WITH RECURSIVE good AS (
         |  SELECT a.vec_id AS i, b.vec_id AS j
         |  FROM (SELECT vec_id, embedding, $signBucketSql AS bkt FROM embeddings) a
         |  JOIN (SELECT vec_id, embedding, $signBucketSql AS bkt FROM embeddings) b
         |    ON a.bkt = b.bkt AND a.vec_id < b.vec_id
         |  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.3),
         |$componentsSql
         |SELECT id, MIN(r) AS rep FROM reach GROUP BY id""".stripMargin,
    "q_embed_pairs" ->
      s"""SELECT a.vec_id AS i, b.vec_id AS j
         |FROM (SELECT vec_id, embedding, $signBucketSql AS bkt FROM embeddings) a
         |JOIN (SELECT vec_id, embedding, $signBucketSql AS bkt FROM embeddings) b
         |  ON a.bkt = b.bkt AND a.vec_id < b.vec_id
         |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.5""".stripMargin,
    "q_embed_topk" ->
      s"""SELECT a.vec_id AS qid,
         |  ROW_NUMBER() OVER (PARTITION BY a.vec_id
         |    ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) DESC, b.vec_id) AS rank,
         |  b.vec_id AS nid
         |FROM (SELECT vec_id, embedding, $signBucketSql AS bkt FROM embeddings) a
         |JOIN (SELECT vec_id, embedding, $signBucketSql AS bkt FROM embeddings) b
         |  ON a.bkt = b.bkt AND a.vec_id <> b.vec_id
         |QUALIFY rank <= 3""".stripMargin,
    "q_embed_ivf" ->
      """WITH seeds AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
        |               FROM embeddings ORDER BY vec_id LIMIT 16),
        |asgn AS (SELECT e.vec_id AS id, e.embedding, s.cid,
        |  ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |    ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), s.cv) DESC, s.cid) AS rn
        |  FROM embeddings e, seeds s),
        |cells AS (SELECT id, embedding, cid FROM asgn WHERE rn = 1),
        |probes AS (SELECT id AS qid, embedding AS qe, cid FROM asgn WHERE rn <= 2)
        |SELECT p.qid,
        |  ROW_NUMBER() OVER (PARTITION BY p.qid
        |    ORDER BY list_cosine_similarity(CAST(p.qe AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC, c.id) AS rank,
        |  c.id AS nid
        |FROM probes p JOIN cells c ON p.cid = c.cid AND p.qid <> c.id
        |QUALIFY rank <= 3""".stripMargin,
    "q_embed_ivf2" -> {
      def assign(srcE: String, srcC: String) =
        s"""SELECT id, v, cid FROM (
           |  SELECT e.id, e.v, c.cid,
           |    ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
           |  FROM $srcE e, $srcC c) WHERE rn = 1""".stripMargin
      def mean(srcA: String) =
        s"""SELECT cid, list(m ORDER BY pos) AS cv FROM (
           |  SELECT a.cid, t.i AS pos, AVG(a.v[t.i]) AS m
           |  FROM $srcA a, UNNEST(generate_series(1, len(a.v))) t(i)
           |  GROUP BY a.cid, t.i) GROUP BY cid""".stripMargin
      s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c0 AS (SELECT id AS cid, v AS cv FROM e ORDER BY id LIMIT 16),
         |a1 AS (${assign("e", "c0")}),
         |m1 AS (${mean("a1")}),
         |a2 AS (${assign("e", "m1")}),
         |m2 AS (${mean("a2")}),
         |ranked AS (
         |  SELECT e.id, e.v, c.cid,
         |    ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
         |  FROM e, m2 c),
         |cells AS (SELECT id, v, cid FROM ranked WHERE rn = 1),
         |probes AS (SELECT id AS qid, v AS qv, cid FROM ranked WHERE rn <= 2)
         |SELECT p.qid,
         |  ROW_NUMBER() OVER (PARTITION BY p.qid ORDER BY list_cosine_similarity(p.qv, c.v) DESC, c.id) AS rank,
         |  c.id AS nid
         |FROM probes p JOIN cells c ON p.cid = c.cid AND p.qid <> c.id
         |QUALIFY rank <= 3""".stripMargin
    },
    "q_embed_hardneg" ->
      """WITH seeds AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
        |               FROM embeddings ORDER BY vec_id LIMIT 16),
        |asgn AS (SELECT e.vec_id AS id, e.embedding, s.cid,
        |  ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |    ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), s.cv) DESC, s.cid) AS rn
        |  FROM embeddings e, seeds s),
        |cells AS (SELECT id, embedding, cid FROM asgn WHERE rn = 1),
        |probes AS (SELECT id AS qid, embedding AS qe, cid FROM asgn WHERE rn <= 2),
        |lbl AS (SELECT vec_id, label FROM embeddings)
        |SELECT p.qid,
        |  ROW_NUMBER() OVER (PARTITION BY p.qid
        |    ORDER BY list_cosine_similarity(CAST(p.qe AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC, c.id) AS rank,
        |  c.id AS nid
        |FROM probes p JOIN cells c ON p.cid = c.cid AND p.qid <> c.id
        |JOIN lbl la ON la.vec_id = p.qid JOIN lbl lb ON lb.vec_id = c.id
        |WHERE la.label <> lb.label
        |QUALIFY rank <= 3""".stripMargin,
    "q_ann_recall" ->
      """WITH seeds AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
        |               FROM embeddings ORDER BY vec_id LIMIT 16),
        |asgn AS (SELECT e.vec_id AS id, e.embedding, s.cid,
        |  ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |    ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), s.cv) DESC, s.cid) AS rn
        |  FROM embeddings e, seeds s),
        |cells AS (SELECT id, embedding, cid FROM asgn WHERE rn = 1),
        |q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS qe
        |      FROM embeddings WHERE vec_id % 50 = 0),
        |probes AS (SELECT qid, qe, cid FROM (
        |  SELECT q.vec_id AS qid, q.qe, s.cid,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.qe, s.cv) DESC, s.cid) AS rn
        |  FROM q, seeds s) WHERE rn <= 2),
        |approx AS (SELECT p.qid, c.id AS nid,
        |  ROW_NUMBER() OVER (PARTITION BY p.qid
        |    ORDER BY list_cosine_similarity(p.qe, CAST(c.embedding AS DOUBLE[])) DESC, c.id) AS rank
        |  FROM probes p JOIN cells c ON p.cid = c.cid AND p.qid <> c.id
        |  QUALIFY rank <= 3),
        |exact AS (SELECT q.vec_id AS qid, b.vec_id AS nid,
        |  ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(q.qe, CAST(b.embedding AS DOUBLE[])) DESC, b.vec_id) AS rank
        |  FROM q, embeddings b WHERE q.vec_id <> b.vec_id
        |  QUALIFY rank <= 3)
        |SELECT e.qid, CAST(COUNT(*) AS BIGINT) AS n_exact,
        |  CAST(SUM(CASE WHEN a.nid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
        |FROM exact e LEFT JOIN approx a ON e.qid = a.qid AND e.nid = a.nid
        |GROUP BY e.qid""".stripMargin,
    "q_cluster_cards" ->
      """WITH seeds AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
        |               FROM embeddings ORDER BY vec_id LIMIT 16),
        |asgn AS (SELECT e.vec_id AS id, s.cid,
        |  ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |    ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), s.cv) DESC, s.cid) AS rn
        |  FROM embeddings e, seeds s),
        |cells AS (SELECT id, cid FROM asgn WHERE rn = 1),
        |cnt AS (SELECT c.cid, CAST(e.label AS BIGINT) AS value,
        |               CAST(COUNT(*) AS BIGINT) AS n_value
        |        FROM cells c JOIN embeddings e ON e.vec_id = c.id GROUP BY 1, 2),
        |tot AS (SELECT cid, CAST(SUM(n_value) AS BIGINT) AS n FROM cnt GROUP BY cid),
        |best AS (SELECT cid, value, n_value,
        |  ROW_NUMBER() OVER (PARTITION BY cid ORDER BY n_value DESC, value ASC) AS rn
        |  FROM cnt)
        |SELECT b.cid, t.n, b.value AS top_value, b.n_value AS top_n
        |FROM best b JOIN tot t USING (cid) WHERE b.rn = 1""".stripMargin,
    "q_multimodal_dhash" ->
      """WITH src AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |p AS (SELECT doc_id, text, n, GREATEST(1, n // 49) AS stride FROM src),
        |q2 AS (SELECT doc_id, text, n, stride,
        |  CASE WHEN n = 0 THEN 0 ELSE LEAST(49, (n + stride - 1) // stride) END AS out_len FROM p),
        |s AS (SELECT doc_id,
        |  list_transform(range(0, out_len), i -> unicode(text[1 + i*stride])) AS b FROM q2)
        |SELECT doc_id AS asset_id,
        |  CAST(COALESCE(list_sum(list_transform(range(1, len(b)), i ->
        |    CASE WHEN b[i+1] > b[i] THEN (1::BIGINT << CAST(i-1 AS INT)) ELSE 0 END)), 0) AS BIGINT) AS dh
        |FROM s""".stripMargin,
    "q_multimodal_neardup" ->
      """WITH src AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |p AS (SELECT doc_id, text, n, GREATEST(1, n // 49) AS stride FROM src),
        |q2 AS (SELECT doc_id, text, n, stride,
        |  CASE WHEN n = 0 THEN 0 ELSE LEAST(49, (n + stride - 1) // stride) END AS out_len FROM p),
        |s AS (SELECT doc_id,
        |  list_transform(range(0, out_len), i -> unicode(text[1 + i*stride])) AS b FROM q2),
        |h AS (SELECT doc_id,
        |  CAST(COALESCE(list_sum(list_transform(range(1, len(b)), i ->
        |    CASE WHEN b[i+1] > b[i] THEN (1::BIGINT << CAST(i-1 AS INT)) ELSE 0 END)), 0) AS BIGINT) AS dh
        |FROM s)
        |SELECT a.doc_id AS i, b.doc_id AS j,
        |  CAST(bit_count(xor(a.dh, b.dh)) AS BIGINT) AS hamming
        |FROM h a JOIN h b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.dh, b.dh)) <= 6""".stripMargin,
    "q_multimodal_resize" ->
      """WITH src AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |p AS (SELECT doc_id, text, n, GREATEST(1, n // 48) AS stride FROM src),
        |q2 AS (SELECT doc_id, text, n, stride,
        |  CASE WHEN n = 0 THEN 0 ELSE LEAST(48, (n + stride - 1) // stride) END AS out_len
        |FROM p)
        |SELECT doc_id AS asset_id, CAST(n AS BIGINT) AS in_bytes,
        |  CAST(out_len AS BIGINT) AS out_bytes,
        |  CAST(COALESCE(list_sum(list_transform(range(0, out_len),
        |    i -> unicode(text[1 + i*stride]))), 0) AS BIGINT) AS byte_sum,
        |  CASE WHEN n = 0 THEN -1 ELSE unicode(text[1]) END AS first_byte,
        |  CASE WHEN n = 0 THEN -1 ELSE unicode(text[1 + (out_len-1)*stride]) END AS last_byte
        |FROM q2""".stripMargin,
    "q_multimodal_frames" ->
      """WITH src AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |fr AS (SELECT doc_id, text, n, UNNEST(range(0, (n + 63) // 64)) AS f FROM src),
        |sel AS (SELECT * FROM fr WHERE f % 3 = 0)
        |SELECT doc_id AS asset_id, CAST(f AS BIGINT) AS frame_idx,
        |  CAST(LEAST(64, n - f*64) AS BIGINT) AS frame_bytes,
        |  CAST(COALESCE(list_sum(list_transform(
        |    range(f*64 + 1, f*64 + LEAST(64, n - f*64) + 1),
        |    j -> unicode(text[j]))), 0) AS BIGINT) AS byte_sum
        |FROM sel""".stripMargin,
    "q_multimodal" ->
      """SELECT doc_id AS asset_id, octet_length(encode(text)) AS n_bytes,
        |  ascii(substr(text, 1, 1)) AS first_byte,
        |  CAST(list_sum(list_transform(range(1, length(text)+1), i -> unicode(text[i]))) AS BIGINT) AS byte_sum,
        |  CAST(16 + octet_length(encode(text)) % 64 AS INT) AS width,
        |  CAST(((16 + octet_length(encode(text)) % 64) * 3) // 4 AS INT) AS height
        |FROM documents""".stripMargin)

  /** Exact 3-gram Jaccard pairs — the shared oracle for the exact and
    * MinHash dedup queries (MinHash params are sized so recall is 1.0
    * on this corpus; verified locally and in ScalaTest).
    */
  /** df-capped Jaccard over the boilerplate-tailed corpus — mirrors
    * [[graft.functions.Dedup.ngramJaccardPairs]]'s capped-space
    * semantics: shingles with df > cap vanish from the inverted index
    * AND the per-doc set sizes, so jaccard is computed entirely in the
    * capped shingle space (hot boilerplate leaves numerator and
    * denominator together — same form as the winnow oracle).
    */
  private def cappedJaccardSql(threshold: Double, maxDocFreq: Int): String =
    s"""WITH docs AS (SELECT doc_id, text || ' $boilerplate' AS text FROM documents),
       |tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM docs),
       |sh AS (SELECT DISTINCT doc_id, s FROM (
       |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
       |  FROM tok, UNNEST(generate_series(1, len(w)-2)) t(i))),
       |kept AS (SELECT * FROM sh WHERE s IN (
       |  SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= $maxDocFreq)),
       |cnt AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY 1),
       |pairs AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS inter
       |          FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT i, j, CAST(inter AS DOUBLE)/(ca.n + cb.n - inter) AS jac
       |FROM pairs JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
       |WHERE CAST(inter AS DOUBLE)/(ca.n + cb.n - inter) >= $threshold""".stripMargin

  /** Full DuckDB rendering of [[graft.functions.Dedup.minhashLshPairs]]
    * with a binding band-bucket cap, over the skew corpus (docs 0..59
    * rewritten to [[skewText]]). Per distinct (doc, shingle): FNV-1a 64
    * base hash (ordered byte fold, as in [[simhashPairsSql]]); per hash
    * k: h_k = a_k·base + b_k mod 2^64 with the implementation's exact
    * constants inlined as UBIGINT literals ([[graft.functions.MinHashImpl.constants]])
    * and the wrapping multiply split HUGEINT-safe; the signature is the
    * per-k MIN under SIGNED 64-bit order (Java `<`), rendered by
    * recentering UBIGINT into HUGEINT two's-complement range. Band
    * buckets group by the raw 4-value signature slice — the same
    * partition the implementation's xxhash64(slice) key induces — and
    * buckets over the cap are dropped before the candidate self-join;
    * survivors are exact-Jaccard-verified as usual.
    */
  private def cappedMinhashSql(threshold: Double, cap: Int): String = {
    val ks = graft.functions.MinHashImpl.constants(64).zipWithIndex.map {
      case ((a, b), k) =>
        s"($k, ${java.lang.Long.toUnsignedString(a)}::UBIGINT, " +
          s"${java.lang.Long.toUnsignedString(b)}::UBIGINT)"
    }.mkString(", ")
    // a_k·base mod 2^64 with base, a both column-valued (cf. mul64,
    // whose multiplier is a compile-time constant).
    val me = "CAST(((CAST(bh % 4294967296 AS HUGEINT) * CAST(ks.a AS HUGEINT)) + " +
      "((((CAST(bh AS HUGEINT) // 4294967296) * CAST(ks.a AS HUGEINT)) % 4294967296) * 4294967296)) " +
      s"% $M64 AS UBIGINT)"
    val h = s"CAST((CAST($me AS HUGEINT) + CAST(ks.b AS HUGEINT)) % $M64 AS UBIGINT)"
    s"""WITH docs AS (SELECT doc_id,
       |  CASE WHEN doc_id < 60 THEN '$skewText' ELSE text END AS text FROM documents),
       |tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM docs),
       |sh AS (SELECT DISTINCT doc_id, s FROM (
       |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
       |  FROM tok, UNNEST(generate_series(1, len(w)-2)) t(i))),
       |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
       |base AS (SELECT doc_id, s,
       |  list_reduce(
       |    list_prepend(14695981039346656037::UBIGINT,
       |      list_transform(range(1, length(s)+1), i -> CAST(unicode(s[i]) AS UBIGINT))),
       |    (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211) % $M64 AS UBIGINT)) AS bh
       |  FROM sh),
       |hk AS (SELECT doc_id, ks.k AS k,
       |  CASE WHEN $h >= 9223372036854775808::UBIGINT
       |       THEN CAST($h AS HUGEINT) - $M64 ELSE CAST($h AS HUGEINT) END AS hv
       |  FROM base, (VALUES $ks) ks(k, a, b)),
       |mins AS (SELECT doc_id, k, MIN(hv) AS m FROM hk GROUP BY 1, 2),
       |sig AS (SELECT doc_id, CAST(k // 4 AS INT) AS band,
       |        list(m ORDER BY k) AS bsig FROM mins GROUP BY 1, 2),
       |bsz AS (SELECT band, bsig, COUNT(*) AS c FROM sig GROUP BY 1, 2),
       |kept AS (SELECT s.doc_id, s.band, s.bsig FROM sig s
       |         JOIN bsz z ON s.band = z.band AND s.bsig = z.bsig WHERE z.c <= $cap),
       |cands AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
       |          FROM kept a JOIN kept b
       |          ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
       |pairs AS (SELECT c.i, c.j, COUNT(*) AS inter
       |          FROM cands c JOIN sh a ON a.doc_id = c.i
       |          JOIN sh b ON b.doc_id = c.j AND b.s = a.s
       |          GROUP BY 1, 2)
       |SELECT i, j, CAST(inter AS DOUBLE)/(ca.n + cb.n - inter) AS jac
       |FROM pairs JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
       |WHERE CAST(inter AS DOUBLE)/(ca.n + cb.n - inter) >= $threshold""".stripMargin
  }

  private def exactJaccardSql(threshold: Double): String =
    s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id, s FROM (
       |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
       |  FROM tok, UNNEST(generate_series(1, len(w)-2)) t(i))),
       |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
       |pairs AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS inter
       |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT i, j, CAST(inter AS DOUBLE)/(ca.n + cb.n - inter) AS jac
       |FROM pairs JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
       |WHERE CAST(inter AS DOUBLE)/(ca.n + cb.n - inter) >= $threshold""".stripMargin
}
