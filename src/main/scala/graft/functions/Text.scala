package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale training-data pipelines:
  * token counting, quality scoring, language-ID heuristic, document
  * fingerprinting. All are pure Column expressions (whole-stage
  * codegen'd; no UDFs) so they survive 100 TB scans.
  */
object Text {

  private lazy val logger =
    org.slf4j.LoggerFactory.getLogger("graft.Text")

  /** Canonical text normalization — the pre-dedup/pre-fingerprint
    * step every large pipeline runs so near-duplicates differing only
    * in case, punctuation, spacing, or numerals collapse onto one
    * form: lowercase → punctuation→space (word boundaries survive; a
    * deletion would weld "end.Start" into one token) → optional
    * digit folding (every digit → 0, so timestamps/ids/counters stop
    * making boilerplate unique) → whitespace runs collapse → trim.
    *
    * All stages are codegen'd built-ins (lower + regexp_replace), one
    * fused projection in the scan stage. Character classes are
    * EXPLICIT ASCII ranges, not `\s`/`\p{Punct}` shorthands: Java
    * regex (Spark) and RE2 (DuckDB and most other engines) disagree
    * on shorthand membership (e.g. `\s` and \x0B), and a
    * normalization whose output differs per engine poisons every
    * downstream fingerprint. Unicode-aware folding (accents, NFKC) is
    * deliberately out of scope here — it needs a locale-pinned
    * expression and breaks cross-engine bit-parity.
    */
  def normalize(text: Column, lowercase: Boolean = true,
      stripPunct: Boolean = true, foldDigits: Boolean = false): Column = {
    val lowered = if (lowercase) lower(text) else text
    val punct =
      if (stripPunct) regexp_replace(lowered, "[!-/:-@\\[-`{-~]", " ")
      else lowered
    val digits = if (foldDigits) regexp_replace(punct, "[0-9]", "0") else punct
    trim(regexp_replace(digits, "[ \\t\\n\\r]+", " "))
  }

  /** Whitespace tokens, empty strings dropped (array form — used where
    * the token list itself is needed, e.g. simhash). Fused codegen'd
    * scan ([[TokensExpr]]); the filter(split) composition's lambda
    * evaluates interpreted.
    */
  def tokens(text: Column): Column = TokenExprs.tokens(text)

  /** Token count — fused codegen'd scan (the size(filter(split))
    * composition evaluates interpreted; see TokenExprs).
    */
  def tokenCount(text: Column): Column = TokenExprs.token_count(text)

  /** Count of alphabetic characters. */
  def alphaChars(text: Column): Column =
    length(regexp_replace(text, "[^a-zA-Z]", ""))

  /** Sequence packing for training-data assembly: assign each document
    * to a fixed-token-budget pack — the standard step between a
    * curated corpus and a trainer consuming fixed-length sequences.
    * Returns (id, bucket, pack, n_tokens): documents are salted into
    * `buckets` independent packing streams (id mod buckets), ordered
    * by id within a stream, and a document joins the pack that is
    * open when it starts (`pack = floor(cum_tokens_before / budget)`
    * within its bucket).
    *
    * Semantics (deterministic and fully relational — one window over
    * each salt partition, no driver loop): a pack overflows by at
    * most its last document's tokens, the streaming-packer behavior;
    * a document with ≥ budget tokens closes its pack by itself. At
    * cluster scale the bucket count is the parallelism knob: each
    * bucket's running sum is an independent in-partition sort-window
    * (PARTITION BY bucket), so no global ordering bottleneck exists —
    * size buckets ≈ cores × a small factor, exactly like
    * shuffle-partition sizing.
    */
  /** [[packSequences]] with the bucket count auto-sized to the
    * session's scheduling parallelism (`defaultParallelism × 2` — the
    * same small-multiple rule as shuffle-partition sizing, so every
    * core keeps an in-partition sort-window busy and a straggler
    * bucket can rebalance). The gate pins `buckets = 8` for oracle
    * determinism; production callers use this.
    */
  def packSequencesAuto(df: org.apache.spark.sql.DataFrame, idCol: Column, text: Column,
      budget: Int): org.apache.spark.sql.DataFrame =
    packSequences(df, idCol, text, budget,
      math.max(1, df.sparkSession.sparkContext.defaultParallelism * 2))

  def packSequences(df: org.apache.spark.sql.DataFrame, idCol: Column, text: Column,
      budget: Int, buckets: Int): org.apache.spark.sql.DataFrame = {
    require(budget > 0 && buckets > 0, "budget and buckets must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(idCol.as("id"), tokenCount(text).as("n_tokens"))
      .withColumn("bucket", pmod(col("id"), lit(buckets.toLong)))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("id"), col("bucket"),
        floor(col("cum_before") / budget.toLong).as("pack"),
        col("n_tokens").cast("long").as("n_tokens"))
  }

  /** Document chunking — the dual of [[packSequences]] (packing
    * combines short docs into a budget; chunking splits long docs to
    * fit one): fixed-size token windows of `chunkTokens` advancing by
    * `stride` (stride < chunkTokens ⇒ overlapping windows, the
    * standard long-context training shape). Returns
    * (id, chunk_idx, chunk_text, n_tokens); the last chunk is the
    * remainder (>= chunkTokens - stride + 1 tokens when the doc
    * overflows, the whole doc otherwise). Pure narrow plan: tokenize
    * once, explode the per-doc chunk index range, slice — no shuffle
    * at all; chunk count arithmetic is integer-exact
    * ((n - chunk + stride - 1) div stride + 1), never a double ceil.
    */
  def chunkDocs(df: org.apache.spark.sql.DataFrame, idCol: Column, text: Column,
      chunkTokens: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(stride > 0 && stride <= chunkTokens,
      s"stride must be in [1, chunkTokens], got $stride")
    val n = col("__n")
    val nChunks = when(n <= chunkTokens, lit(1L))
      .otherwise(expr(s"((__n - $chunkTokens + $stride - 1) div $stride) + 1"))
    df.select(idCol.as("id"), tokens(text).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .withColumn("chunk_idx", explode(sequence(lit(0L), nChunks - 1L)))
      .select(col("id"), col("chunk_idx"),
        array_join(slice(col("__toks"),
          (col("chunk_idx") * stride + 1L).cast("int"), lit(chunkTokens)), " ").as("chunk_text"),
        least(n - col("chunk_idx") * stride, lit(chunkTokens.toLong)).as("n_tokens"))
  }

  /** Inference-serving batch planner — the pad-to-max dual of
    * [[packSequences]] (training packs CONCAT docs to a budget;
    * inference batches PAD docs to the batch max, and padding is pure
    * waste): group docs of similar length, then cut fixed-count
    * batches in length order so each batch's max ≈ its members.
    *
    * Scale shape (the packSequences lesson applied): a global
    * length-sort rank would serialize into one range-sorted window —
    * instead docs land in FIXED-GRID length bins
    * (`bin = n_tokens div binWidth`, integer-exact, no stats pass —
    * the histSketch philosophy), and ranking/batching runs
    * per-bin (`PARTITION BY bin`), embarrassingly parallel. Per-doc
    * padding is bounded by `binWidth - 1` regardless of corpus shape,
    * so the knob trades waste against bin parallelism explicitly.
    * Returns (id, n_tokens, bin, batch) — batch numbered within bin;
    * (bin, batch) is the servable unit.
    */
  def lengthBatches(df: org.apache.spark.sql.DataFrame, idCol: Column, text: Column,
      batchSize: Int, binWidth: Int): org.apache.spark.sql.DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bin")).orderBy(col("n_tokens"), col("id"))
    df.select(idCol.as("id"), tokenCount(text).cast("long").as("n_tokens"))
      .withColumn("bin", expr(s"n_tokens div $binWidth"))
      .withColumn("batch",
        ((org.apache.spark.sql.functions.row_number().over(w) - 1)
          / batchSize).cast("long"))
  }

  /** [[lengthBatches]] rolled up to the audit face a serving owner
    * reads: per (bin, batch) the member count, the batch max (= the
    * padded length every member pays), and the total padding waste.
    */
  def lengthBatchReport(df: org.apache.spark.sql.DataFrame, idCol: Column,
      text: Column, batchSize: Int, binWidth: Int): org.apache.spark.sql.DataFrame =
    lengthBatches(df, idCol, text, batchSize, binWidth)
      .groupBy(col("bin"), col("batch"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("max_tokens"),
        (max(col("n_tokens")) * count(lit(1)) - sum(col("n_tokens"))).as("pad_tokens"))

  /** [[lengthBatches]] with the bin width derived from the corpus: one
    * cheap max-length aggregate, width sized so ~2× the session
    * parallelism bins cover the length range (every core gets bins to
    * rank; waste stays ≤ width − 1 per doc).
    */
  def lengthBatchesAuto(df: org.apache.spark.sql.DataFrame, idCol: Column,
      text: Column, batchSize: Int): org.apache.spark.sql.DataFrame = {
    val maxLen = df.select(max(tokenCount(text)).cast("long")).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val bins = math.max(1, df.sparkSession.sparkContext.defaultParallelism * 2)
    lengthBatches(df, idCol, text, batchSize,
      math.max(1L, (maxLen + bins) / bins).toInt)
  }

  /** Training-sequence assembly — the step after [[packSequences]]:
    * concatenate each pack's documents (id-ordered, space-joined)
    * into one sequence row (bucket, pack, seq_text, n_docs,
    * n_tokens). One aggregation keyed by (bucket, pack); state per
    * group is bounded by the token budget (a pack overflows by at
    * most its last document), so the concat never degenerates — the
    * standard corpus → fixed-length-sequence materialization for a
    * trainer. Ordering inside the group uses
    * `array_sort(collect_list(struct(id, text)))`: deterministic,
    * no global sort.
    */
  def assemblePacks(df: org.apache.spark.sql.DataFrame, idCol: Column, text: Column,
      budget: Int, buckets: Int): org.apache.spark.sql.DataFrame = {
    val assign = packSequences(df, idCol, text, budget, buckets)
    assign.join(df.select(idCol.as("id"), text.as("text")), "id")
      .groupBy(col("bucket"), col("pack"))
      .agg(
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("id"), col("text")))),
            s => s.getField("text"))).as("seq_text"),
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"))
  }

  /** [[assemblePacks]] over [[packSequencesAuto]]'s parallelism-sized
    * buckets — the production default.
    */
  def assemblePacksAuto(df: org.apache.spark.sql.DataFrame, idCol: Column, text: Column,
      budget: Int): org.apache.spark.sql.DataFrame =
    assemblePacks(df, idCol, text, budget,
      math.max(1, df.sparkSession.sparkContext.defaultParallelism * 2))

  /** C4-style line-level dedup (Raffel et al. 2020, "Exploring the
    * Limits of Transfer Learning…" §2.2 — C4 removed any three-sentence
    * span occurring more than once; line granularity is the common
    * production variant): every occurrence of a line whose GLOBAL
    * occurrence count reaches `minCount` is removed from every
    * document, and each document's surviving lines are reassembled in
    * their original order. Returns (id, text, n_lines, n_removed) for
    * every input document — callers drop emptied docs themselves.
    *
    * Scale shape — only boilerplate moves through the heavy shuffles:
    * (1) one fingerprint-count shuffle over exploded line hashes
    * (map-side combine; 8-byte keys, never line text); (2) the
    * boilerplate relation (count >= minCount — by construction a tiny
    * fraction of distinct lines) broadcasts back onto the exploded
    * hashes, and only MATCHING occurrences aggregate into per-doc
    * removal sets; (3) documents join their removal set by id and the
    * rewrite happens as an array filter on the intact row — the
    * document text itself is never exploded, re-sorted, or
    * re-concatenated. A 64-bit line fingerprint stands in for the
    * line ([[SimHashImpl.fnv1a]]): collisions remove an innocent line
    * with probability ~ n_distinct²/2⁶⁴ — the same envelope as every
    * fingerprint dedup path here.
    */
  def lineDedup(df: org.apache.spark.sql.DataFrame, idCol: Column, text: Column,
      minCount: Long, delimiter: String = "\n"): org.apache.spark.sql.DataFrame = {
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    val delimRegex = java.util.regex.Pattern.quote(delimiter)
    val docs = df.select(idCol.as("id"), text.as("text"))
    val lh = docs.select(col("id"),
      explode(split(col("text"), delimRegex)).as("line"))
      .select(col("id"), SimHash.fnv1a64(col("line")).as("lh"))
    val boiler = lh.groupBy("lh").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount).select("lh")
    val rm = lh.join(broadcast(boiler), "lh")
      .groupBy("id").agg(collect_set(col("lh")).as("rm"))
    val lines = split(col("text"), delimRegex)
    val kept = filter(lines, l => !array_contains(col("rm"), SimHash.fnv1a64(l)))
    docs.join(rm, Seq("id"), "left")
      .withColumn("rm", coalesce(col("rm"), array().cast("array<long>")))
      .select(col("id"),
        array_join(kept, delimiter).as("text"),
        size(lines).cast("long").as("n_lines"),
        (size(lines) - size(kept)).cast("long").as("n_removed"))
  }

  /** Exact duplicated-span removal (the fixed-window variant of Lee
    * et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better" ExactSubstr): every token covered by ANY `spanTokens`-
    * token window whose content occurs >= 2 times in the whole corpus
    * (across documents or within one) is removed; surviving tokens
    * reassemble in order, single-space-joined (whitespace normalizes
    * — the same contract as the reference's byte-span cuts). Where
    * [[lineDedup]] needs boilerplate to align on line boundaries,
    * this catches duplicated prose ANYWHERE in a document. The
    * suffix-array machinery of the paper finds maximal repeats of
    * arbitrary length; the fixed-L window gives the same coverage
    * guarantee for repeats >= L — relationally, in three shuffles:
    *
    * (1) one gram-fingerprint count shuffle (8-byte hashes, map-side
    * combine); (2) the duplicated-gram relation (>= 2 occurrences —
    * a tiny fraction by construction) broadcasts onto the position
    * stream to flag duplicate window STARTS; (3) coverage is a
    * per-document running `max` over the last L-1 positions (one
    * window, no self-join), and the kept tokens re-aggregate by doc.
    * Returns (id, text, n_tokens, n_removed) for every input doc.
    * 64-bit gram fingerprints: collisions remove an innocent span at
    * ~n_grams²/2⁶⁴ — the house fingerprint envelope.
    */
  def dedupSpans(df: org.apache.spark.sql.DataFrame, idCol: Column, text: Column,
      spanTokens: Int): org.apache.spark.sql.DataFrame = {
    val (base, pos) = spanPositions(df, idCol, text, spanTokens)
    val dupGrams = pos.filter(col("gh").isNotNull)
      .groupBy("gh").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("gh"), lit(1).as("dup"))
    cutCovered(base, pos, dupGrams, spanTokens)
  }

  /** Surgical span-level DECONTAMINATION: cut every train token
    * covered by a `spanTokens`-token window that occurs ANYWHERE in
    * the eval corpus, keeping the rest of the document — the
    * span-granular companion to [[graft.functions.Dedup.decontaminate]]
    * (which flags whole documents). The right tool when contamination
    * is a quoted benchmark question inside an otherwise-good document:
    * doc-level dropping throws away the document, span cutting removes
    * exactly the leaked window plus its minimal cover.
    *
    * Same machinery as [[dedupSpans]]; the cut relation is the
    * distinct eval window set instead of the corpus-wide dup grams —
    * benchmark-scale, so it broadcasts into the coverage join.
    */
  def decontaminateSpans(train: org.apache.spark.sql.DataFrame, trainId: Column,
      trainText: Column, eval: org.apache.spark.sql.DataFrame, evalText: Column,
      spanTokens: Int): org.apache.spark.sql.DataFrame = {
    val (base, pos) = spanPositions(train, trainId, trainText, spanTokens)
    val (_, evalPos) = spanPositions(eval,
      monotonically_increasing_id(), evalText, spanTokens)
    val evalGrams = evalPos.filter(col("gh").isNotNull)
      .select(col("gh")).distinct().withColumn("dup", lit(1))
    cutCovered(base, pos, evalGrams, spanTokens)
  }

  /** Per-token position stream with the window-gram hash that STARTS
    * at each position (null in the tail where no full window fits).
    */
  private def spanPositions(df: org.apache.spark.sql.DataFrame, idCol: Column,
      text: Column, spanTokens: Int): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    require(spanTokens >= 2, s"spanTokens must be >= 2, got $spanTokens")
    val base = df.select(idCol.as("id"), tokens(text).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
    val pos = base.filter(col("n") >= 1)
      .select(col("id"), col("n"), col("toks"),
        explode(sequence(lit(1L), col("n"))).as("i"))
      .select(col("id"), col("n"), col("i"),
        element_at(col("toks"), col("i").cast("int")).as("tok"),
        when(col("i") <= col("n") - (spanTokens - 1),
          SimHash.fnv1a64(array_join(
            slice(col("toks"), col("i").cast("int"), lit(spanTokens)), " "))).as("gh"))
    (base, pos)
  }

  /** Rewrite each doc without any token covered by a flagged window:
    * coverage = max(flag) over the trailing `spanTokens`-row frame,
    * kept tokens re-concatenate in order.
    */
  private def cutCovered(base: org.apache.spark.sql.DataFrame,
      pos: org.apache.spark.sql.DataFrame, cutGrams: org.apache.spark.sql.DataFrame,
      spanTokens: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("id").orderBy("i")
      .rowsBetween(-(spanTokens - 1), Window.currentRow)
    val kept = pos.join(broadcast(cutGrams), Seq("gh"), "left")
      .withColumn("dupflag", coalesce(col("dup"), lit(0)))
      .withColumn("cov", max(col("dupflag")).over(w))
      .filter(col("cov") === 0)
      .groupBy("id").agg(
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("i"), col("tok")))),
            s => s.getField("tok"))).as("kept_text"),
        count(lit(1)).as("n_kept"))
    base.select(col("id"), col("n")).join(kept, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("kept_text"), lit("")).as("text"),
        col("n").as("n_tokens"),
        (col("n") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** Corpus-relative rare-word statistics — the quality signal the
    * doc-local scores ([[qualityScore]], repetition) cannot see:
    * what fraction of a document's tokens are rare in the WHOLE
    * corpus (high ratio ⇒ gibberish/OCR noise/codes; near-zero with
    * high repetition ⇒ boilerplate). "Rare" is RANK-based — the
    * bottom `bottomFrac` of the vocabulary by corpus count (ties
    * broken by token) — so the definition is scale-invariant: the
    * same fraction of the vocabulary is rare at any corpus size,
    * where an absolute count threshold drifts with every new drop.
    *
    * Plan: two partial-aggregated shuffles (corpus token counts,
    * per-doc re-aggregation), one join of the token stream against
    * the Zipf-bounded count relation (AQE broadcasts it while it
    * fits), and one vocabulary-sized ranking window — the only
    * single-partition step runs over distinct tokens, never the
    * corpus. Returns (id, n_tokens, n_rare, rare_ratio); the ratio
    * is one IEEE division of exact integers — cross-engine
    * deterministic.
    */
  def rareWordStats(df: org.apache.spark.sql.DataFrame, idCol: Column, text: Column,
      bottomFrac: Double): org.apache.spark.sql.DataFrame = {
    require(bottomFrac > 0.0 && bottomFrac < 1.0, s"bottomFrac must be in (0,1), got $bottomFrac")
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(idCol.as("id"), explode(tokens(text)).as("t"))
    val counts = tok.groupBy("t").agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(Window.orderBy(col("cnt"), col("t"))))
      .withColumn("vocab", count(lit(1)).over(Window.partitionBy()))
      .withColumn("rare", col("rnk") <= ceil(col("vocab") * bottomFrac))
      .select("t", "rare")
    tok.join(counts, "t")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("rare"), 1L).otherwise(0L)).as("n_rare"))
      .select(col("id"), col("n_tokens"), col("n_rare"),
        (col("n_rare").cast("double") / col("n_tokens").cast("double")).as("rare_ratio"))
  }

  /** Compressibility quality signal: deflate(text).length / length —
    * boilerplate/looped text compresses far below natural prose,
    * random noise sits near (or above) 1.0; production pipelines
    * threshold it from both sides (Dolma/RefinedWeb-style). zlib
    * level 6, deterministic, codegen'd scan with a thread-local
    * Deflater; 1.0 for empty text. Spec-only surface — DuckDB has no
    * SQL zlib to oracle the byte count against.
    */
  def compressionRatio(text: Column): Column =
    when(length(text) === 0, lit(1.0))
      .otherwise(TokenExprs.deflate_size(text).cast("double") /
        length(text).cast("double"))

  /** Count of tokens that appear in `stopwords` (codegen'd scan). */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    TokenExprs.stopword_hits(text, stopwords)

  /** Heuristic quality score in [0,1]: blend of stopword density,
    * alphabetic ratio, and length saturation. Deterministic double
    * arithmetic over integer counts (oracle-reproducible).
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val ntok = tokenCount(text).cast("double")
    val stopRatio = stopwordCount(text, stopwords).cast("double") / greatest(ntok, lit(1.0))
    val alphaRatio = alphaChars(text).cast("double") / greatest(length(text).cast("double"), lit(1.0))
    val lenSat = least(ntok, lit(100.0)) / lit(100.0)
    lit(0.5) * stopRatio + lit(0.3) * alphaRatio + lit(0.2) * lenSat
  }

  /** Per-language stopword sets for the language-ID heuristic. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "es"),
    "fr" -> Seq("le", "la", "de", "et", "que", "en", "est"),
    "de" -> Seq("der", "die", "das", "und", "zu", "in", "ist"))

  /** n-gram/stopword-vote language ID: argmax of per-language stopword
    * hits, ties resolved by list order, 'unknown' when no hits.
    */
  def langId(text: Column): Column = {
    val hits = langStopwords.map { case (lang, sw) => lang -> stopwordCount(text, sw) }
    val decided = hits.foldRight(lit("unknown")) { case ((lang, h), els) =>
      val others = hits.filter(_._1 != lang).map(_._2)
      val isMax = others.foldLeft(h > 0) { (acc, o) => acc && h >= o }
      when(isMax, lit(lang)).otherwise(els)
    }
    decided
  }

  /** Word n-gram repetition stats — struct(n_grams, n_distinct,
    * top_count) in one fused codegen'd pass ([[NgramStatsExpr]]). The
    * raw inputs to Gopher-style repetition quality filters.
    */
  def ngramStats(text: Column, n: Int): Column = TokenExprs.ngram_stats(text, n)

  /** Fraction of n-gram occurrences that repeat an earlier gram:
    * (n_grams − n_distinct) / n_grams, 0.0 for gram-less docs — the
    * duplicate-n-gram repetition signal used to drop loops/boilerplate
    * from training corpora.
    */
  def dupNgramRatio(text: Column, n: Int): Column = {
    val st = ngramStats(text, n)
    val total = st.getField("n_grams")
    when(total === 0, lit(0.0))
      .otherwise((total - st.getField("n_distinct")).cast("double") / total.cast("double"))
  }

  /** Occurrence share of the single most frequent n-gram:
    * top_count / n_grams, 0.0 for gram-less docs — the top-n-gram
    * repetition signal (catches "the the the …"-style degeneration).
    */
  def topNgramFraction(text: Column, n: Int): Column = {
    val st = ngramStats(text, n)
    val total = st.getField("n_grams")
    when(total === 0, lit(0.0))
      .otherwise(st.getField("top_count").cast("double") / total.cast("double"))
  }

  /** BPE-ish pre-tokenizer pattern (the GPT-2 `pat` with the
    * RE2-unsupported trailing-space lookahead and unicode classes
    * dropped, so Java regex and DuckDB RE2 match identically):
    * contraction suffixes, optional-space letter runs, digit runs, and
    * punctuation runs. Whitespace between tokens is skipped by the
    * scan, not emitted.
    */
  val bpePattern = "'(s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+"

  /** BPE-ish token list via the codegen'd native regexp_extract_all —
    * the pre-tokenization a byte-pair encoder would train on; its
    * length is the standard "token count" proxy where whitespace
    * counting is too crude (punctuation-dense or digit-dense text).
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  /** Count of BPE-ish tokens. */
  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** PII patterns, deliberately restricted to the regex subset Java
    * and RE2 interpret identically (no lookaround, ASCII classes,
    * bounded quantifiers, `\b` word boundaries).
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val longDigitsPattern = "[0-9]{7,}"

  /** Redact common PII shapes with typed placeholders — the standard
    * pre-training scrub pass. Email first (it contains digits and
    * dots that the later patterns would shred), then IPv4, then long
    * digit runs (phone/account-number-ish). Pure codegen'd
    * regexp_replace chain; Spark's replace is global, matching
    * DuckDB's 'g' flag.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      longDigitsPattern, "<NUM>")

  /** Content fingerprint: md5 of whitespace-normalized lowercase text.
    * Identical fingerprints ⇒ exact duplicates (modulo whitespace/case).
    */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** Flesch–Kincaid readability report — the classic grade-level
    * quality feature (Kincaid et al. 1975) next to [[qualityScore]] /
    * [[gopherQuality]]-style filters, as one codegen'd struct column:
    * (words, sentences, syllables, fk_micro) with
    * fk = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59
    * in MICRO-UNITS via exact integer floor divisions (the two ratio
    * terms floor independently — deterministic, oracle-renderable;
    * quantization ≤ 2e-6 grades). Counts are regex-run counts with
    * EXPLICIT ASCII classes so Java regex and RE2 agree byte-for-byte
    * (the [[normalize]] oracle posture): words = runs of
    * non-[space/tab/newline/CR], sentences = runs of [.!?] (0 clamps
    * to 1 in the ratio — headline-only docs), syllables = vowel-group
    * runs [aeiouy]+ on the lowercased text (the standard cheap
    * approximation; hyphenation-grade syllabification is out of
    * scope). BIAS DIRECTION: vowel-group counting has no silent-e or
    * vowel-team handling, so it OVERCOUNTS syllables on silent-e- and
    * -ed/-es-dense English ('make' → 2, 'stopped' → 2) and fk_micro
    * skews HIGH (harder-looking) on such text — tune grade-level
    * thresholds against this measure itself, not against a
    * dictionary-syllabified FK. Empty/whitespace docs report
    * fk_micro NULL (a ratio over
    * zero words is meaningless — callers filter or quarantine).
    * fk_micro is NEGATIVE for trivially short fragments, exactly as
    * the formula behaves.
    */
  def readability(text: Column): Column = {
    // decimal(38,0) floor division (the Graph.idiv pattern): a LONG
    // '/' is double division, exact only under 2^53 — a pathological
    // multi-GB doc would silently round the quotient
    def longDiv(a: Column, b: Column): Column = {
      val ad = a.cast("decimal(38,0)")
      val bd = b.cast("decimal(38,0)")
      ((ad - pmod(ad, bd)) / bd).cast("long")
    }
    val w = regexp_count(text, lit("[^ \t\n\r]+")).cast("long")
    val sRaw = regexp_count(text, lit("[.!?]+")).cast("long")
    val syl = regexp_count(lower(text), lit("[aeiouy]+")).cast("long")
    val fk = when(w === 0, lit(null).cast("long"))
      .otherwise(longDiv(lit(390000L) * w, greatest(sRaw, lit(1L))) +
        longDiv(lit(11800000L) * syl, w) - lit(15590000L))
    struct(w.as("words"), sRaw.as("sentences"), syl.as("syllables"),
      fk.as("fk_micro"))
  }

  /** Lowercased host of a `scheme://` URL (userinfo and port
    * stripped) — the shared decomposition behind [[urlNormalize]] /
    * [[urlHost]] / [[urlDomain]]. Empty string on non-URLs; callers
    * null it out against the scheme check.
    */
  private def rawHost(url: Column): Column = {
    val ff = regexp_replace(url, "#.*$", "")
    val rest = regexp_extract(ff, "^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1)
    val auth = regexp_extract(rest, "^([^/?]*)", 1)
    val hp = regexp_replace(auth, "^[^@]*@", "")
    lower(regexp_extract(hp, "^([^:]*)", 1))
  }

  /** Lowercased host of a URL — the per-site grouping key for crawl
    * stats and host-level quality priors ([[urlNormalize]]'s host
    * component standalone). Userinfo and port stripped; non-URL
    * input → NULL, matching the normalize contract.
    */
  def urlHost(url: Column): Column = {
    val scheme = regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    // a scheme-valid but HOSTLESS input ('https:///x', 'http://?a=1')
    // is malformed, not an empty-host resource — NULL it so dedup
    // keyed on host quarantines it with the other non-URLs instead of
    // collapsing every hostless string onto one empty key
    when(scheme === "" || rawHost(url) === "", lit(null).cast("string"))
      .otherwise(rawHost(url))
  }

  /** Registrable-domain HEURISTIC of a URL's host — the per-publisher
    * rollup key (sub.shop.example.com and www.example.com are one
    * publisher): the last two labels, or the last THREE when the
    * second-level label is a generic registry slot (co, com, net,
    * org, gov, ac, edu) under a two-letter ccTLD (amazon.co.uk,
    * b.gov.cn). A deliberate approximation — the real answer is the
    * Public Suffix List, a mutable external dataset this library
    * will not embed; the heuristic covers the dominant web-corpus
    * mass and is DOCUMENTED as such ([[urlDomainPsl]] accepts your
    * own public-suffix relation for registry-exact rollups, with
    * this heuristic as its miss fallback). Single-label hosts
    * (localhost) pass through; non-URLs → NULL. Label access is
    * null-safe `get()` (the ANSI posture — out-of-range reads are
    * conditions here, never errors).
    */
  def urlDomain(url: Column): Column = {
    val host = urlHost(url)
    val labels = split(host, "\\.")
    val n = size(labels)
    val tld = get(labels, n - 1)
    val sl = get(labels, n - 2)
    val third = get(labels, n - 3)
    val ccSld = Seq("co", "com", "net", "org", "gov", "ac", "edu")
    when(host.isNull, lit(null).cast("string"))
      .when(third.isNotNull && sl.isin(ccSld: _*) && length(tld) === 2,
        concat_ws(".", third, sl, tld))
      .when(sl.isNotNull, concat_ws(".", sl, tld))
      .otherwise(host)
  }

  /** Registry-exact registrable domain via a CALLER-SUPPLIED public-
    * suffix relation — the escape hatch [[urlDomain]]'s scaladoc
    * promises: `suffixes`' first column holds Public Suffix List
    * rule lines VERBATIM — plain suffixes ('com', 'co.uk',
    * 'github.io'), wildcard rules ('*.ck': every LABEL.ck is a
    * public suffix), and exception rules ('!www.ck': www.ck is a
    * registrable domain despite the wildcard). PSL semantics: an
    * exception rule beats everything; otherwise the LONGEST matching
    * rule wins; the registrable domain is the matched public suffix
    * plus one label. Hosts that ARE a public suffix ('github.io',
    * 'b.ck' under '*.ck') yield NULL — they name a registry slot,
    * not a registrant; hosts matching NO rule fall back to the
    * [[urlDomain]] heuristic, so a partial suffix list degrades
    * gracefully instead of nulling the tail. Non-URLs and hostless
    * inputs stay NULL. Depth bound: effective suffixes up to 5
    * labels (exact and exception) / wildcards '*.X' with X up to 4
    * labels — deep enough for the PSL private section's 5-label
    * rules (s3.dualstack.&lt;region&gt;.amazonaws.com). Rules BEYOND
    * the bound are never matched; they are DETECTED up front and
    * logged as a WARNING naming examples (the signaled-truncation
    * posture of coreness/ktruss), or THROW when `strictDepth =
    * true` — a caller feeding a deeper future PSL gets a signal,
    * never a silent heuristic fallback.
    *
    * Scale shape: the rule relation is deduped, lowercased, and
    * BROADCAST; matching is fourteen broadcast left joins (5 exact +
    * 5 exception + 4 wildcard candidate forms, one per tail length),
    * so the corpus-sized relation never exchanges and the whole pass
    * stays map-side. Returns `df` plus the `out` column; an existing
    * `out` column is REPLACED (the withColumn contract). The
    * operator reserves the temp names `__h __ls __n __t1..__t5
    * __m1..__m5 __e1..__e5 __w2..__w5` and REFUSES input that
    * already carries any of them — silently overwriting caller data
    * would corrupt pass-through columns.
    */
  def urlDomainPsl(df: org.apache.spark.sql.DataFrame, url: Column,
      suffixes: org.apache.spark.sql.DataFrame,
      out: String = "domain",
      strictDepth: Boolean = false): org.apache.spark.sql.DataFrame = {
    val reserved = Seq("__h", "__ls", "__n") ++
      (1 to 5).flatMap(k => Seq(s"__t$k", s"__m$k", s"__e$k")) ++
      (2 to 5).map(k => s"__w$k")
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"urlDomainPsl: input columns ${clash.mkString(", ")} collide " +
        "with the operator's reserved temp names — rename them first")
    val sfx = suffixes
      .select(lower(col(suffixes.columns.head)).as("__sfx")).distinct()
    // depth audit on the (small, broadcastable-by-contract) rule
    // relation: rules deeper than the match joins can reach would
    // silently fall through to the heuristic — signal instead
    val labelsOf = when(col("__sfx").startsWith("!"),
        size(split(substring(col("__sfx"), 2, 1 << 24), "\\.")))
      .otherwise(size(split(col("__sfx"), "\\.")))
    // one bound covers all three rule forms: exact rules > 5 labels,
    // exception tails > 5 labels, wildcards '*.X' with X > 4 labels
    // (the '*' token makes the split 5 exactly at the bound)
    val tooDeep = sfx.filter(labelsOf > 5)
      .limit(6).collect().map(_.getString(0))
    if (tooDeep.nonEmpty) {
      val msg = "urlDomainPsl: suffix rules beyond the 5-label depth " +
        "bound are IGNORED (their hosts take the heuristic " +
        s"fallback): ${tooDeep.mkString(", ")}"
      if (strictDepth) throw new IllegalArgumentException(msg)
      logger.warn(msg)
    }
    var d = df.withColumn("__h", urlHost(url))
      .withColumn("__ls", split(col("__h"), "\\."))
      .withColumn("__n", size(col("__ls")))
    for (k <- 1 to 5) {
      d = d.withColumn(s"__t$k", when(col("__n") >= k,
          concat_ws(".",
            slice(col("__ls"), col("__n") - lit(k) + 1, lit(k)))))
        .join(broadcast(sfx.withColumnRenamed("__sfx", s"__m$k")),
          col(s"__t$k") === col(s"__m$k"), "left")
        // exception rule '!tail' — matches any host whose k-tail
        // equals the rule's labels; its registrable domain IS that
        // tail (the rule minus '!' is suffix+1 by construction)
        .join(broadcast(sfx.withColumnRenamed("__sfx", s"__e$k")),
          concat(lit("!"), col(s"__t$k")) === col(s"__e$k"), "left")
    }
    // wildcard rule '*.X' — an EFFECTIVE suffix of k labels when X
    // is the host's (k−1)-tail and a label exists to fill the '*'
    // (n ≥ k); the matched public suffix is the host's own k-tail
    for (k <- 2 to 5) {
      d = d.join(broadcast(sfx.withColumnRenamed("__sfx", s"__w$k")),
        when(col("__n") >= k, concat(lit("*."), col(s"__t${k - 1}")))
          === col(s"__w$k"), "left")
    }
    // a matched suffix consuming the WHOLE host names a registry
    // slot, not a registrant → NULL; otherwise prepend one label
    def domFor(k: Int): Column =
      when(col("__n") > k, concat(
        element_at(col("__ls"), col("__n") - k), lit("."),
        col(s"__t$k"))).otherwise(lit(null).cast("string"))
    def hitAt(k: Int): Column =
      if (k >= 2) col(s"__m$k").isNotNull || col(s"__w$k").isNotNull
      else col(s"__m$k").isNotNull
    // the no-match fallback re-expressed over the ALREADY-COMPUTED
    // __h/__ls/__n attributes instead of calling urlDomain(url):
    // semantically identical (the __h-null case is handled first
    // below), but referencing attributes keeps the fused join
    // stage's generated code small — re-inlining the full regex
    // decomposition here was what pushed the whole-stage class past
    // janino's limits and dropped the stage to interpreted eval
    val fTld = get(col("__ls"), col("__n") - 1)
    val fSl = get(col("__ls"), col("__n") - 2)
    val fThird = get(col("__ls"), col("__n") - 3)
    val ccSld = Seq("co", "com", "net", "org", "gov", "ac", "edu")
    val heur = when(
        fThird.isNotNull && fSl.isin(ccSld: _*) && length(fTld) === 2,
        concat_ws(".", fThird, fSl, fTld))
      .when(fSl.isNotNull, concat_ws(".", fSl, fTld))
      .otherwise(col("__h"))
    val dom = when(col("__h").isNull, lit(null).cast("string"))
      // exceptions first (PSL: an exception rule prevails outright),
      // longest exception wins; its registrable domain is the tail
      .when(col("__e5").isNotNull, col("__t5"))
      .when(col("__e4").isNotNull, col("__t4"))
      .when(col("__e3").isNotNull, col("__t3"))
      .when(col("__e2").isNotNull, col("__t2"))
      .when(col("__e1").isNotNull, col("__t1"))
      .when(hitAt(5), domFor(5))
      .when(hitAt(4), domFor(4))
      .when(hitAt(3), domFor(3))
      .when(hitAt(2), domFor(2))
      .when(hitAt(1), domFor(1))
      .otherwise(heur)
    d.withColumn(out, dom)
      .drop((1 to 5).flatMap(k => Seq(s"__t$k", s"__m$k", s"__e$k")) ++
        (2 to 5).map(k => s"__w$k") ++
        Seq("__h", "__ls", "__n"): _*)
  }

  /** Canonical URL form for web-corpus dedup and crawl-frontier
    * keying — the normalization every CommonCrawl-scale pipeline
    * applies before URL-level dedup, as a single codegen'd column
    * expression (regex decomposition, NOT a UDF, so the whole pass
    * stays inside WholeStageCodegen and every regex is mirrored
    * verbatim by the DuckDB oracle):
    *
    *  - scheme and host LOWERCASED; userinfo (`user:pw@`) dropped
    *  - default ports stripped (http:80, https:443); other explicit
    *    ports kept
    *  - empty path → `/`; path otherwise kept byte-exact (dot-segment
    *    resolution and percent-encoding case are out of scope)
    *  - fragment dropped
    *  - query parameters SORTED (byte order — order never
    *    distinguishes resources), empty parameters dropped, and with
    *    `stripTracking` the utm_… / fbclid / gclid / msclkid
    *    click-tracking family removed; an emptied query drops its `?`
    *  - non-URL input (no `scheme://`) → NULL, and so does a
    *    scheme-valid but HOSTLESS input ('https:///x') — callers
    *    filter or quarantine instead of silently passing garbage
    *    through dedup
    *
    * Bracketed IPv6 authorities are out of scope (reg-name hosts
    * only — the web-corpus case). The parameter filter's lambda
    * touches only its own variable (the house HOF discipline).
    */
  def urlNormalize(url: Column, stripTracking: Boolean = true): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val ff = regexp_replace(url, "#.*$", "")
    val rest = regexp_extract(ff, "^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1)
    val auth = regexp_extract(rest, "^([^/?]*)", 1)
    val hp = regexp_replace(auth, "^[^@]*@", "")
    val host = rawHost(url)
    val port = regexp_extract(hp, ":([0-9]+)$", 1)
    val pathq = regexp_extract(rest, "^[^/?]*(.*)$", 1)
    val rawPath = regexp_extract(pathq, "^([^?]*)", 1)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    val query = regexp_extract(pathq, "\\?(.*)$", 1)
    val keep =
      if (stripTracking)
        // names anchored: utm_* is a prefix FAMILY, but fbclid/gclid/
        // msclkid are exact keys — 'gclid_backup=1' is a distinct
        // resource and must survive (name followed by '=' or end)
        (p: Column) => p =!= "" &&
          !p.rlike("^(utm_[^=]*|fbclid|gclid|msclkid)(=|$)")
      else (p: Column) => p =!= ""
    val qs = array_join(array_sort(filter(split(query, "&"), keep)), "&")
    val portPart = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val out = concat(scheme, lit("://"), host, portPart, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
    // hostless-but-schemed inputs are malformed → NULL (the urlHost
    // contract), never a 'scheme:///' pseudo-resource
    when(scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(out)
  }

  /** TF-IDF term weights per (doc, term): tf = in-doc term count,
    * df = number of docs containing the term, idf smoothed
    * sklearn-style (ln((N+1)/(df+1)) + 1). Two hash shuffles — one on
    * (doc, term) for tf, one on term for df — both with map-side
    * partial aggregation; the df relation joins back on term (AQE
    * picks SMJ or broadcast by vocabulary size). The corpus size N is
    * one count() aggregate, as in ivfTopKAuto.
    */
  def tfidf(df: org.apache.spark.sql.DataFrame, idCol: Column, text: Column): org.apache.spark.sql.DataFrame = {
    val docs = df.select(idCol.as("id"), text.as("text"))
    val n = docs.count()
    val tf = docs.select(col("id"), explode(tokens(col("text"))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "term")
      .withColumn("tfidf",
        col("tf") * (log((lit(n.toDouble) + 1.0) / (col("df") + lit(1.0))) + lit(1.0)))
      .select(col("id"), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** Corpus-level collocation mining: adjacent-bigram association
    * scores over the whole corpus — the phrase-discovery face of the
    * text toolkit (multi-word expressions for tokenizer vocab
    * seeding, template detection via abnormally-strong transitions).
    * Score = conditional lift, p(y|x)/p(y) = c(xy)·T / (c(x)·c(y))
    * with T the corpus token count — the exp of PMI. Reported in
    * EXACT micro-units (floor(unit·c(xy)·T / (c(x)·c(y))),
    * decimal(38,0) internally like [[Graph]]): a float log-PMI sums
    * nothing but still renders differently per engine; the integer
    * lift is bit-stable and order-preserving (log is monotone), so
    * ranking and thresholding decisions are identical.
    *
    * Scale shape: one scan building tokens + in-array bigrams (both
    * codegen'd, no window — bigrams come from an index transform
    * over the token array, so no per-doc sort or lag shuffle), one
    * (x,y) count and one x count — all partial-aggregable; the
    * unigram table joins back by key (vocabulary-sized, NOT
    * corpus-sized; broadcastable for real vocabularies) and T is a
    * 1-row broadcast. `minCount` prunes the bigram tail BEFORE the
    * joins — at web scale the hapax bigram tail is the dominant
    * cost and nothing below ~5 occurrences is statistically usable.
    *
    * Output: (x, y, n_xy, n_x, n_y, lift) for bigrams with
    * c(xy) ≥ `minCount`; lift in micro-units as BIGINT.
    */
  def collocations(df: org.apache.spark.sql.DataFrame, text: Column,
      minCount: Long, unit: Long = 1000000L): org.apache.spark.sql.DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    require(unit > 0, "unit must be positive")
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    def idiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("decimal(38,0)")
    val toks = df.select(tokens(text).as("w"))
    val uni = toks.select(explode(col("w")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val tot = uni.agg(dec(sum(col("c"))).as("T"))
    val bi = toks
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(w) - 2), i -> struct(w[i] AS x, w[i+1] AS y))"))
        .as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minCount)
    bi.join(uni.select(col("t").as("x"), col("c").as("n_x")), "x")
      .join(uni.select(col("t").as("y"), col("c").as("n_y")), "y")
      .crossJoin(broadcast(tot))
      .select(col("x"), col("y"), col("n_xy"), col("n_x"), col("n_y"),
        idiv(dec(lit(unit)) * dec(col("n_xy")) * col("T"),
          dec(col("n_x")) * dec(col("n_y"))).cast("long").as("lift"))
  }

  /** Windowed co-occurrence counts (the GloVe/word2vec statistic):
    * directed pairs (x, y) where y follows x within `window` tokens,
    * counted over the whole corpus — [[collocations]] generalized
    * from adjacency to a ±window context (symmetric counts are the
    * directed relation summed both ways; left directed so callers
    * keep the distance-asymmetric signal). Counts are UNWEIGHTED
    * exact integers — GloVe's 1/d distance weighting would leave
    * the integer lattice; apply it downstream from the (x, y, d)
    * variant if needed (here d is folded out to keep the relation
    * vocabulary²-bounded, not ×window).
    *
    * Scale shape: pairs come from an in-array index transform over
    * the token array (codegen'd; no per-doc window function, no
    * positional self-join — the join formulation shuffles every
    * (doc, pos) row TWICE and was rejected on plan shape), then ONE
    * (x, y) count aggregate — partial-aggregable, the only
    * corpus-scale exchange. `minCount` prunes the hapax tail. At
    * web scale the pair explosion is corpus_tokens × window rows
    * into a map-side-combined aggregate — the standard GloVe
    * pre-pass cost, linear in both.
    */
  def cooccurrence(df: org.apache.spark.sql.DataFrame, text: Column,
      window: Int, minCount: Long = 1L): org.apache.spark.sql.DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(minCount >= 1, "minCount must be >= 1")
    val toks = df.select(tokens(text).as("w"))
    toks.filter(size(col("w")) >= 2)
      .select(explode(expr(
        s"""flatten(transform(
           |  filter(sequence(1, $window), d -> size(w) - 1 - d >= 0),
           |  d -> transform(sequence(0, size(w) - 1 - d),
           |    i -> struct(w[i] AS x, w[i + d] AS y))))""".stripMargin)).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Token-length checksum — cheap deterministic content digest
    * expressible in ANSI SQL (oracle-checkable alongside the md5
    * fingerprint).
    */
  def tokenLengthChecksum(text: Column): Column =
    TokenExprs.token_length_sum(text)

  /** Gopher-style rule thresholds (Rae et al., "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher",
    * arXiv:2112.11446 §A1.1). Ratio thresholds are PER-MILLE integers
    * so every rule evaluates in exact Long arithmetic — a double
    * formulation (`dup_frac <= 0.1`) can flip boundary docs between
    * engines; `(n2 - d2) * 1000 <= dupMaxPm * n2` cannot. Defaults are
    * the paper's where the paper has one, corpus-split-verified
    * otherwise.
    *
    * @param minTokens / maxTokens  word-count bounds (paper: 50 / 100k)
    * @param meanLenMinPm / meanLenMaxPm  mean word length bounds ×1000
    *        (paper: 3–10 chars)
    * @param alphaMinPm  min alphabetic share of non-whitespace chars
    *        ×1000 (stands in for the paper's "80% of words contain an
    *        alphabetic character" with the fused char-level scan)
    * @param minStopwordHits  min hits of the stopword list (paper: 2)
    * @param dup2MaxPm / top2MaxPm  max duplicate-2-gram share / max
    *        top-2-gram occurrence share ×1000 (paper family: dup and
    *        top n-gram fraction caps)
    */
  final case class GopherThresholds(
      minTokens: Int = 50, maxTokens: Int = 100000,
      meanLenMinPm: Long = 3000L, meanLenMaxPm: Long = 10000L,
      alphaMinPm: Long = 800L, minStopwordHits: Int = 2,
      dup2MaxPm: Long = 200L, top2MaxPm: Long = 180L)

  /** Gopher-style document quality rules as ONE fused projection —
    * per-rule booleans plus the conjunction, every comparison in exact
    * integer arithmetic over the fused scans ([[TokenCountExpr]],
    * [[TokenLengthSumExpr]], [[AlphaCharsExpr]], [[StopwordHitsExpr]],
    * [[NgramStatsExpr]]): the text is scanned a constant number of
    * times inside one whole-stage-codegen span, no explode, no
    * shuffle, no per-row UDF. Returns
    * struct(ok_word_count, ok_mean_word_len, ok_alpha, ok_stopwords,
    * ok_dup_2gram, ok_top_2gram, keep).
    *
    * Why flags and not just a filter: at curation scale the per-rule
    * rejection PROFILE is the operator's real output — it is how a
    * pipeline owner audits what a threshold change would do before
    * rerunning a 100 TB pass (sum the booleans per source/shard).
    */
  def gopherRules(text: Column, stopwords: Seq[String],
      t: GopherThresholds = GopherThresholds()): Column = {
    val ntok = tokenCount(text).cast("long")
    val lensum = TokenExprs.token_length_sum(text)
    val nalpha = alphaChars(text).cast("long")
    val hits = stopwordCount(text, stopwords).cast("long")
    val g2 = ngramStats(text, 2)
    val n2 = g2.getField("n_grams").cast("long")
    val d2 = g2.getField("n_distinct").cast("long")
    val top2 = g2.getField("top_count").cast("long")
    val okWords = ntok >= t.minTokens && ntok <= t.maxTokens
    val okMean = lensum * 1000L >= ntok * t.meanLenMinPm &&
      lensum * 1000L <= ntok * t.meanLenMaxPm
    // gram-less docs (n2 = 0) pass the repetition rules vacuously:
    // 0 <= pm * 0 holds, no CASE needed
    val okAlpha = nalpha * 1000L >= lensum * t.alphaMinPm
    val okStop = hits >= t.minStopwordHits
    val okDup2 = (n2 - d2) * 1000L <= n2 * t.dup2MaxPm
    val okTop2 = top2 * 1000L <= n2 * t.top2MaxPm
    struct(
      okWords.as("ok_word_count"),
      okMean.as("ok_mean_word_len"),
      okAlpha.as("ok_alpha"),
      okStop.as("ok_stopwords"),
      okDup2.as("ok_dup_2gram"),
      okTop2.as("ok_top_2gram"),
      (okWords && okMean && okAlpha && okStop && okDup2 && okTop2).as("keep"))
  }

  /** [[gopherRules]] as a filter: keep only documents passing every
    * rule. A pure codegen'd scan predicate — composes with parquet
    * column pruning (only `text` is read beyond the caller's columns).
    */
  def gopherFilter(df: org.apache.spark.sql.DataFrame, text: Column,
      stopwords: Seq[String],
      t: GopherThresholds = GopherThresholds()): org.apache.spark.sql.DataFrame =
    df.filter(gopherRules(text, stopwords, t).getField("keep"))

  /** Per-source aggregate quality signals in EXACT integers: (source,
    * n_docs, tok_sum, alpha_sum, len_sum) from one fused-token-expr
    * corpus scan — the evidence table behind domain-level curation
    * (per-doc filters miss the boilerplate farm whose every page is
    * individually plausible; the SOURCE's aggregates give it away).
    */
  def sourceStats(df: org.apache.spark.sql.DataFrame, sourceCol: Column,
      text: Column): org.apache.spark.sql.DataFrame =
    df.groupBy(sourceCol.as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(text)).as("tok_sum"),
        sum(alphaChars(text)).as("alpha_sum"),
        sum(length(text).cast("long")).as("len_sum"))

  /** Domain-level gate: drop every document whose SOURCE fails the
    * aggregate thresholds — the computed form of a domain blocklist
    * (UT1-style lists curate by hand; this derives the block set from
    * the corpus itself). A source passes iff its mean tokens/doc ≥
    * `minMeanTokens` and its alpha share ≥ `minAlphaPerMille`, both
    * as exact integer cross-multiplications (tok_sum ≥ minMean·n;
    * alpha_sum·1000 ≥ apm·len_sum) — no float means, so pass/fail is
    * engine-exact at any corpus size. Two corpus scans (stats, then
    * the semi join); the passing-source relation is source-cardinality
    * and broadcasts.
    */
  def sourceFilter(df: org.apache.spark.sql.DataFrame, sourceCol: String,
      text: Column, minMeanTokens: Long,
      minAlphaPerMille: Long): org.apache.spark.sql.DataFrame = {
    require(minMeanTokens >= 0 && minAlphaPerMille >= 0 &&
      minAlphaPerMille <= 1000, "thresholds out of range")
    val pass = sourceStats(df, col(sourceCol), text)
      .filter(col("tok_sum") >= lit(minMeanTokens) * col("n_docs") &&
        col("alpha_sum") * 1000 >= lit(minAlphaPerMille) * col("len_sum"))
      .select(col("source").as(sourceCol))
    df.join(broadcast(pass), Seq(sourceCol), "left_semi")
  }

  /** A bigram language model as RELATIONS — the CCNet-style quality
    * scorer's model (Wenzek et al., "CCNet: Extracting High Quality
    * Monolingual Datasets from Web Crawl Data", LREC 2020, which
    * scores crawl text by a reference-corpus LM's perplexity). The
    * "model" is two count relations + the corpus token total; at
    * 100 TB the vocabulary/bigram relations are Zipf-bounded (grow
    * sub-linearly in corpus size — the measured BPE-training shape),
    * persist as parquet, and join distributively: there is no
    * driver-side model object at all.
    */
  final case class LmModel(unigrams: org.apache.spark.sql.DataFrame,
      bigrams: org.apache.spark.sql.DataFrame, totalTokens: Long)

  /** Train [[LmModel]] from a reference corpus: one token explode for
    * unigram counts, one bigram explode for bigram counts — two hash
    * aggregations with map-side partials, nothing else.
    */
  def lmTrain(df: org.apache.spark.sql.DataFrame, text: Column): LmModel = {
    val w = df.select(tokens(text).as("w"))
    val uni = w.select(explode(col("w")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c1"))
    val bi = w.select(explode(bigramPairs(col("w"))).as("b"))
      .select(col("b.p").as("p"), col("b.t").as("t"))
      .groupBy("p", "t").agg(count(lit(1)).as("c2"))
    val total = uni.agg(sum(col("c1"))).collect()(0).getLong(0)
    LmModel(uni, bi, total)
  }

  /** (prev, cur) bigram structs of a token array. */
  private def bigramPairs(w: Column): Column =
    zip_with(slice(w, lit(1), greatest(size(w) - 1, lit(0))),
      slice(w, lit(2), greatest(size(w) - 1, lit(0))),
      (a, b) => struct(a.as("p"), b.as("t")))

  /** Stupid-backoff LM scoring (Brants et al., "Large Language Models
    * in Machine Translation", EMNLP 2007): per bigram position,
    * S(cur|prev) = c2/c1(prev) when the bigram was seen, else
    * α · max(c1(cur), 1)/N (unigram backoff; unseen words take the
    * add-one floor so the log stays finite). Output per doc:
    * n_scored, n_backoff, ll = Σ ln S, ppl = exp(−ll/n_scored) — the
    * CCNet filter signal (drop/flag high-perplexity docs).
    *
    * Scale shape: one bigram explode of the scored corpus, one hash
    * join against the bigram relation and two against the unigram
    * relation (AQE broadcasts them while they fit — vocabulary-sized,
    * not corpus-sized), one per-doc aggregation. Docs under 2 tokens
    * produce no row.
    */
  def lmScore(df: org.apache.spark.sql.DataFrame, idCol: Column, text: Column,
      model: LmModel, alpha: Double = 0.4): org.apache.spark.sql.DataFrame = {
    val pos = df.select(idCol.as("id"), explode(bigramPairs(tokens(text))).as("b"))
      .select(col("id"), col("b.p").as("p"), col("b.t").as("t"))
    val joined = pos
      .join(model.bigrams, Seq("p", "t"), "left")
      .join(model.unigrams.select(col("t").as("p"), col("c1").as("c1p")), Seq("p"), "left")
      .join(model.unigrams.select(col("t"), col("c1").as("c1t")), Seq("t"), "left")
    val hit = col("c2").isNotNull && col("c1p").isNotNull
    val lp = when(hit, log(col("c2").cast("double")) - log(col("c1p").cast("double")))
      .otherwise(lit(math.log(alpha)) +
        log(greatest(coalesce(col("c1t"), lit(0L)), lit(1L)).cast("double")) -
        lit(math.log(model.totalTokens.toDouble)))
    joined.groupBy(col("id")).agg(
      count(lit(1)).as("n_scored"),
      sum(when(hit, 0L).otherwise(1L)).as("n_backoff"),
      sum(lp).as("ll"))
      .withColumn("ppl", exp(-col("ll") / col("n_scored").cast("double")))
  }

  /** CCNet-style perplexity partitioning (Wenzek et al., LREC 2020 —
    * the head/middle/tail split CC corpora ship with): score every
    * doc against a reference LM ([[lmScore]] — train it on the
    * trusted corpus, the CCNet recipe's Wikipedia role), then assign
    * each doc the equi-depth perplexity bucket WITHIN ITS LANGUAGE
    * (per-language tertiles, not global ones — CCNet's point is that
    * absolute perplexity is incomparable across languages) and the
    * matching label: lowest-perplexity third = `head` (cleanest),
    * then `middle`, `tail`. Pass more/fewer labels for a finer split.
    *
    * Output: (id, lang, n_scored, n_backoff, ll, ppl, ppl_bucket,
    * part). Docs under 2 tokens produce no row (unscorable).
    *
    * Scale shape: the [[lmScore]] plan (bigram explode + vocabulary-
    * sized model joins + one per-doc agg), one id-keyed join to carry
    * the language, then the [[Profile.quantileBuckets]] shape — ONE
    * grouped percentile aggregate (languages-×-bounds-sized, tiny)
    * broadcast back into a codegen'd comparison fold. No per-language
    * sort, no window. The bucket rule is the bounds-comparison fold,
    * so ties sit in the lower cell deterministically; the ppl doubles
    * themselves are ln-based and engine-local (the [[lmScore]]
    * caveat) — cross-engine pinning uses [[lmScoreCounts]].
    */
  def perplexityPartitions(docs: org.apache.spark.sql.DataFrame,
      idCol: Column, textCol: Column, langCol: Column, model: LmModel,
      alpha: Double = 0.4,
      labels: Seq[String] = Seq("head", "middle", "tail")):
      org.apache.spark.sql.DataFrame = {
    require(labels.size >= 2, "need at least 2 partition labels")
    val base = docs.select(idCol.as("id"), langCol.as("lang"),
      textCol.as("__text"))
    val scored = lmScore(base, col("id"), col("__text"), model, alpha)
      .join(base.select(col("id"), col("lang")), Seq("id"))
    Profile.quantileBuckets(scored, Seq("lang"), "ppl", labels.size)
      .withColumn("part", element_at(array(labels.map(lit): _*),
        (col("ppl_bucket") + 1).cast("int")))
  }

  /** The exact-integer face of [[lmScore]] for cross-engine pinning:
    * per doc, the five count sums that fully determine the model
    * lookups (hits, Σc2, Σc1(prev) over hits, Σc1(cur) over backoff
    * positions) — everything except the ln()s, whose last-ulp
    * behavior is libm-specific (the q_text_tfidf precedent).
    */
  def lmScoreCounts(df: org.apache.spark.sql.DataFrame, idCol: Column, text: Column,
      model: LmModel): org.apache.spark.sql.DataFrame = {
    val pos = df.select(idCol.as("id"), explode(bigramPairs(tokens(text))).as("b"))
      .select(col("id"), col("b.p").as("p"), col("b.t").as("t"))
    val joined = pos
      .join(model.bigrams, Seq("p", "t"), "left")
      .join(model.unigrams.select(col("t").as("p"), col("c1").as("c1p")), Seq("p"), "left")
      .join(model.unigrams.select(col("t"), col("c1").as("c1t")), Seq("t"), "left")
    val hit = col("c2").isNotNull && col("c1p").isNotNull
    joined.groupBy(col("id")).agg(
      count(lit(1)).as("n_scored"),
      sum(when(hit, 1L).otherwise(0L)).as("n_hit"),
      sum(when(hit, col("c2")).otherwise(0L)).as("sum_c2"),
      sum(when(hit, col("c1p")).otherwise(0L)).as("sum_c1prev"),
      sum(when(hit, 0L).otherwise(coalesce(col("c1t"), lit(0L)))).as("sum_c1backoff"))
  }
}
