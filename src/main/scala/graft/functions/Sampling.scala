package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftExpr}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic corpus sampling for training-data pipelines —
  * down-sampling and stratified source mixing as pure codegen'd
  * filters, no shuffle, no stored state.
  *
  * Why hash-based instead of `rand()`: Spark's `rand(seed)` is seeded
  * PER PARTITION — membership of a row depends on which partition and
  * position it lands in, so the sample changes under repartitioning,
  * AQE re-planning, and task RETRY (a recomputed partition draws a
  * fresh stream: rows can be double-sampled or lost mid-job). Keying
  * the decision on `splitmix64(id ⊕ salt)` makes membership a
  * pure function of the row — repeatable across runs, stable under
  * retries, and consistent between a pipeline's stages (the same
  * (id, salt) always lands on the same side). Disjoint salts give
  * independent samples; `rate` resolution is 1/2⁶³.
  *
  * The reference has no sampling operator (bytewax routes randomness
  * through user lambdas); this is brief-mandated LLM-pipeline surface
  * alongside dedup/packing.
  */
object Sampling {

  /** splitmix64 of the id (as a codegen'd unary expression) — the same
    * finalizer the LSH planes and MinHash permutations derive from
    * ([[LshBucketImpl]]; Steele et al., "Fast Splittable Pseudorandom
    * Number Generators", OOPSLA'14).
    */
  def splitmix64(id: Column): Column =
    GraftExpr.column(Splitmix64Expr(GraftExpr.expression(id)))

  /** 2⁶³ × rate, the inclusion threshold for `(splitmix64(x) >>> 1)`.
    * Public so oracles can inline the exact same rounding. Only
    * meaningful for rates in (0, 1): [[hashKeep]]/[[stratifiedSample]]
    * short-circuit the endpoints to constant predicates, because under
    * the strict `<` comparison `Long.MaxValue` (the clamped 2⁶³) would
    * still drop the two ids whose `splitmix64 >>> 1` equals
    * `MaxValue` — rate 1.0 must keep ALL rows, not all-but-two.
    */
  def threshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    if (rate >= 1.0) Long.MaxValue
    else math.round(rate * 9.223372036854775807e18)
  }

  /** Keep-this-row predicate: uniform in [0,1) via the hash's top 63
    * bits; rates ≥ 1.0 / ≤ 0.0 fold to constant true/false (no hash
    * evaluated). Exposed for composing into joins/filters directly.
    */
  def hashKeep(id: Column, rate: Double, salt: Long = 0L): Column =
    if (rate >= 1.0) lit(true)
    else if (rate <= 0.0) lit(false)
    else shiftrightunsigned(splitmix64(
      // xor folds the salt in WITHOUT long-add overflow (ANSI mode)
      lit(salt).bitwiseXOR(id)), 1) < lit(threshold(rate))

  /** Deterministic down-sample: keep each row iff
    * `splitmix64(id ⊕ salt) >>> 1 < rate·2⁶³`. A pure filter fused
    * into the scan's whole-stage-codegen span (plan-verified: the
    * predicate sits in `DataFilters` directly over the FileScan; a
    * custom expression cannot reach parquet `PushedFilters`, and a
    * hash predicate would not prune row groups anyway) — no shuffle,
    * no RNG state.
    */
  def hashSample(df: DataFrame, idCol: Column, rate: Double, salt: Long = 0L): DataFrame =
    df.filter(hashKeep(idCol, rate, salt))

  /** Weight-proportional Bernoulli keep: P(keep) = weight/maxWeight,
    * decided by the same splitmix64 membership hash as [[hashKeep]] —
    * quality-/length-weighted corpus down-sampling with identical
    * retry/partition/AQE stability. Keep iff
    * `(h >>> 1) · maxWeight < weight · 2⁶³`, evaluated in
    * decimal(38,0): both products are < 8.6×10³⁷ for any Long weight,
    * so the comparison is EXACT (a double formulation rounds at these
    * magnitudes and an oracle could legitimately disagree on boundary
    * rows). Weights are clamped to [0, maxWeight]: 0 never keeps,
    * ≥ maxWeight always keeps. Null weights drop the row (SQL
    * three-valued comparison) — document weights upstream.
    */
  def weightedKeep(id: Column, weight: Column, maxWeight: Long, salt: Long = 0L): Column = {
    require(maxWeight > 0, s"maxWeight must be positive, got $maxWeight")
    val d38 = "decimal(38,0)"
    val h = shiftrightunsigned(splitmix64(lit(salt).bitwiseXOR(id)), 1)
    val w = least(greatest(weight.cast("long"), lit(0L)), lit(maxWeight))
    (h.cast(d38) * lit(maxWeight).cast(d38)) <
      (w.cast(d38) * lit(Long.MaxValue).cast(d38) + w.cast(d38))
  }

  /** [[weightedKeep]] as a filter. */
  def weightedSample(df: DataFrame, idCol: Column, weight: Column,
      maxWeight: Long, salt: Long = 0L): DataFrame =
    df.filter(weightedKeep(idCol, weight, maxWeight, salt))

  /** Deterministic corpus shuffle + sharding — the "globally shuffle
    * the training set, write S shards" step, as ONE hash-partition
    * shuffle plus an in-partition sort (no global range sort, no
    * sampled range boundaries). The permutation key is
    * `splitmix64(id ⊕ seed) >>> 1`; `shard` = key mod `numShards`
    * (sizes binomial around N/S), `pos` = the row's rank inside its
    * shard under `(key, id)` — the id breaks the (rare) 63-bit key
    * ties, so the permutation is a total order: re-runs, retries, and
    * repartitionings reproduce the identical (shard, pos) for every
    * row, which a `sort(rand())` shuffle cannot promise. At cluster
    * scale pick `numShards` ≥ the write parallelism; each task sorts
    * ~N/S rows and Spark's window sorter spills past memory.
    */
  def shuffleShards(df: DataFrame, idCol: Column, numShards: Int,
      seed: Long = 0L): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    // >>> 1 keeps the key non-negative, so signed (Spark) and unsigned
    // (oracle UBIGINT) comparisons and mods agree for ANY shard count
    val key = shiftrightunsigned(splitmix64(lit(seed).bitwiseXOR(idCol)), 1)
    df.withColumn("shard", pmod(key, lit(numShards.toLong)))
      .withColumn("pos",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(key.asc, idCol.asc))
          .cast("long") - 1L)
  }

  /** [[shuffleShards]] with the shard count derived from the session —
    * 2× `defaultParallelism` (the same rule as `packSequencesAuto`),
    * so every write slot gets work without hand-tuning.
    */
  def shuffleShardsAuto(df: DataFrame, idCol: Column, seed: Long = 0L): DataFrame =
    shuffleShards(df, idCol,
      math.max(1, df.sparkSession.sparkContext.defaultParallelism * 2), seed)

  /** Deterministic fixed-quota selection: exactly `min(k, |stratum|)`
    * rows per stratum — the "exactly 50k docs per source" companion to
    * rate-based [[stratifiedSample]] (a rate can't promise a count).
    * Selection order is the [[shuffleShards]] permutation key, so the
    * quota is a uniform draw that is retry-stable and re-runnable; one
    * hash-partition shuffle on the stratum, rank, filter.
    */
  def takePerStratum(df: DataFrame, idCol: Column, stratumCol: Column, k: Int,
      seed: Long = 0L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val key = shiftrightunsigned(splitmix64(lit(seed).bitwiseXOR(idCol)), 1)
    df.withColumn("__take_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(stratumCol).orderBy(key.asc, idCol.asc)))
      .filter(col("__take_rank") <= k).drop("__take_rank")
  }

  /** Leakage-safe split assignment — train/val/test membership as a
    * PURE HASH OF A GROUP KEY, never the row: pass a duplicate-cluster
    * representative ([[Dedup.connectedComponents]] rep), a domain, or
    * any other "these rows must not straddle splits" key as `groupCol`
    * and every member lands on the same side by construction — the
    * eval-set contamination that row-level `randomSplit` produces when
    * near-duplicates exist is impossible, and the assignment is
    * retry/AQE/re-run stable for the same reason [[hashKeep]] is.
    *
    * Mechanics: `h = splitmix64(group ⊕ salt) >>> 1` ∈ [0, 2⁶³);
    * split i owns `[threshold(cum_{i-1}), threshold(cum_i))` — the
    * same exact-integer thresholds as [[hashKeep]], so an oracle can
    * render the assignment bit-exactly. Fractions must be positive;
    * when they sum to 1 (±1e-9) the last split is the catch-all
    * (`rate-1.0 boundary ids` included — the [[threshold]] endpoint
    * rule); when they sum to less, rows past the last threshold get a
    * NULL split (held out entirely).
    */
  def splitAssign(groupCol: Column, fractions: Seq[(String, Double)],
      salt: Long = 0L): Column = {
    require(fractions.nonEmpty, "splitAssign: no fractions")
    require(fractions.map(_._1).distinct.length == fractions.length,
      s"splitAssign: duplicate split names in ${fractions.map(_._1)}")
    fractions.foreach { case (n, f) =>
      require(f > 0.0, s"splitAssign: fraction for '$n' must be > 0, got $f") }
    val total = fractions.map(_._2).sum
    require(total <= 1.0 + 1e-9, s"splitAssign: fractions sum to $total > 1")
    val closed = total >= 1.0 - 1e-9
    val h = shiftrightunsigned(splitmix64(lit(salt).bitwiseXOR(groupCol)), 1)
    val cums = fractions.scanLeft(0.0)(_ + _._2).tail
    val tail: Column =
      if (closed) lit(fractions.last._1) else lit(null).cast("string")
    val body = (if (closed) fractions.zip(cums).init else fractions.zip(cums))
      .foldRight(tail) { case (((name, _), cum), els) =>
        when(h < lit(threshold(cum)), lit(name)).otherwise(els)
      }
    // a NULL group key gets a NULL split in BOTH forms — without the
    // guard the closed form's catch-all arm would silently pour every
    // unknown-linkage row into the last split (the null comparisons
    // all read falsy); null groups are a caller bug to surface, not
    // bias to absorb
    when(groupCol.isNull, lit(null).cast("string")).otherwise(body)
  }

  /** [[splitAssign]] as a `split` column on the frame. */
  def groupSplit(df: DataFrame, groupCol: Column,
      fractions: Seq[(String, Double)], salt: Long = 0L): DataFrame =
    df.withColumn("split", splitAssign(groupCol, fractions, salt))

  /** Corpus mixing to a TOKEN BUDGET: down-sample each stratum
    * (source) so the expected kept token mass is
    * `min(T_s, sharePm_s/1000 · targetTotal)` — the "assemble a
    * 500B-token mix at 60% web / 30% code / 10% books" step, where
    * [[stratifiedSample]] needs hand-derived rates and cannot promise
    * a budget. One aggregation computes per-stratum token totals T_s;
    * the keep decision is the [[weightedKeep]] membership hash with
    * the per-stratum rate `sharePm·targetTotal/(1000·T_s)` NEVER
    * materialized as a double: keep iff
    * `(h>>>1) · 1000 · T_s < sharePm · targetTotal · 2⁶³`, evaluated
    * in decimal(38,0) where both products are exact for any realistic
    * corpus (T_s, targetTotal < 10¹⁴ tokens) — so the sample is
    * bit-reproducible cross-engine, retry-stable, and rates ≥ 1 keep
    * everything naturally (the inequality saturates). Strata not in
    * `sharesPm` take `defaultSharePm`.
    *
    * The totals relation is stratum-sized and broadcast into the keep
    * filter; the corpus is scanned once for totals and once for the
    * filter (cache the input if the two scans matter).
    */
  def mixToBudget(df: DataFrame, idCol: Column, stratumCol: Column,
      tokensCol: Column, targetTotal: Long, sharesPm: Map[String, Long],
      defaultSharePm: Long = 0L, salt: Long = 0L): DataFrame = {
    require(targetTotal > 0, s"targetTotal must be positive, got $targetTotal")
    require((sharesPm.values ++ Seq(defaultSharePm)).forall(_ >= 0),
      "shares must be non-negative")
    val totals = df.groupBy(stratumCol.as("__stratum"))
      .agg(sum(tokensCol.cast("long")).as("__t"))
    val share = sharesPm.foldLeft(lit(defaultSharePm)) { case (els, (s, pm)) =>
      when(col("__stratum") === lit(s), lit(pm)).otherwise(els)
    }
    val d38 = "decimal(38,0)"
    val h = shiftrightunsigned(splitmix64(lit(salt).bitwiseXOR(idCol)), 1)
    val keep = (h.cast(d38) * lit(1000L).cast(d38) * col("__t").cast(d38)) <
      (share.cast(d38) * lit(targetTotal).cast(d38) *
        lit(Long.MaxValue).cast(d38) + share.cast(d38) * lit(targetTotal).cast(d38))
    df.join(broadcast(totals), stratumCol === col("__stratum"))
      .filter(keep)
      .drop("__stratum", "__t")
  }

  /** Semantic cluster-balanced sampling — the "flatten the topic
    * distribution" curation step (SemDeDup-adjacent: cluster the
    * embedding space, then draw UNIFORMLY ACROSS clusters instead of
    * uniformly across docs, so head topics stop dominating the mix):
    * assign each vector to its nearest centroid (broadcast argmin via
    * [[Similarity.ivfAssign]] — one corpus scan against the nlist-row
    * centroid relation, no shuffle) and draw exactly
    * `min(perCluster, |cluster|)` members per cluster by the
    * [[takePerStratum]] permutation. Returns the id-keyed `(id, cid)`
    * relation (the embed-family shape — payloads join back by id).
    * Centroids come from [[Similarity.ivfCentroids]] (frozen-model
    * contract: re-runs and incremental drops sample against the SAME
    * cluster structure).
    */
  def clusterBalancedSample(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, perCluster: Int, seed: Long = 0L): DataFrame =
    takePerStratum(
      Similarity.ivfAssign(df, idCol, vecCol, centroids)
        .select(col("id"), col("cid")),
      col("id"), col("cid"), perCluster, seed)

  /** Per-stratum keep rates for TEMPERATURE-scaled mixing: expected
    * kept mass per stratum ∝ n_c^α, total ≈ `targetTotal` (α = 1 is
    * proportional sampling, α = 0 a uniform per-stratum budget — the
    * multilingual-corpus balancing rule, Conneau & Lample '19). Rates
    * clamp at 1 (a stratum smaller than its allocation keeps
    * everything; the total then undershoots rather than oversampling
    * elsewhere — re-run with a larger α or explicit [[mixToBudget]]
    * shares when exact totals matter).
    */
  def temperatureRates(counts: Map[Long, Long], alpha: Double,
      targetTotal: Long): Map[Long, Double] = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    require(targetTotal > 0, s"targetTotal must be positive, got $targetTotal")
    val z = counts.values.map(n => math.pow(n.toDouble, alpha)).sum
    counts.collect { case (c, n) if n > 0 =>
      c -> math.min(1.0, targetTotal.toDouble * math.pow(n.toDouble, alpha) / (z * n.toDouble))
    }
  }

  /** [[temperatureRates]] applied as one codegen'd CASE filter over an
    * integral stratum column (cluster id, language bucket, …). The
    * stratum counts come from one aggregation collected to the driver
    * — strata-sized (clusters ≈ √N, languages ≈ dozens), the bounded
    * model fit of the √N-centroid precedent, never corpus-sized.
    * Membership is the same splitmix64 hash as every sampler here:
    * retry-stable, partition-invariant, disjoint under distinct salts.
    */
  def temperatureMix(df: DataFrame, idCol: Column, stratumCol: Column,
      alpha: Double, targetTotal: Long, salt: Long = 0L): DataFrame = {
    val counts = df.groupBy(stratumCol.cast("long").as("__c"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rates = temperatureRates(counts, alpha, targetTotal)
    val u = shiftrightunsigned(splitmix64(lit(salt).bitwiseXOR(idCol)), 1)
    def keep(rate: Double): Column =
      if (rate >= 1.0) lit(true)
      else if (rate <= 0.0) lit(false)
      else u < lit(threshold(rate))
    val pred = rates.foldLeft(lit(false)) { case (els, (c, r)) =>
      when(stratumCol.cast("long") === lit(c), keep(r)).otherwise(els)
    }
    df.filter(pred)
  }

  /** Stratified sampling / corpus mixing: per-stratum keep rates (the
    * "20% of web, 100% of books" recipe), `defaultRate` for strata not
    * listed. One pass, one codegen'd CASE over the stratum column —
    * the idiomatic replacement for `DataFrameStatFunctions.sampleBy`
    * when the sample must be retry-stable and re-runnable.
    */
  def stratifiedSample(df: DataFrame, idCol: Column, stratumCol: Column,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: Long = 0L): DataFrame = {
    val u = shiftrightunsigned(splitmix64(lit(salt).bitwiseXOR(idCol)), 1)
    // endpoint rates become constant branches (same reason as hashKeep:
    // strict `<` against the clamped 2⁶³ would drop two ids at rate 1.0)
    def keep(rate: Double): Column =
      if (rate >= 1.0) lit(true)
      else if (rate <= 0.0) lit(false)
      else u < lit(threshold(rate))
    val pred = rates.foldLeft(keep(defaultRate)) { case (els, (stratum, rate)) =>
      when(stratumCol === lit(stratum), keep(rate)).otherwise(els)
    }
    df.filter(pred)
  }

  private def dec38(c: Column): Column = c.cast("decimal(38,0)")
  private def idiv38(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("decimal(38,0)")

  /** Hashed word-n-gram bucket ids for one document: FNV-1a 64 over
    * the space-joined gram (a space can never appear inside a
    * [[Text.tokens]] token — the [[LmFused]] bigram-key argument),
    * top 63 bits mod `numBuckets` (the unsigned shift makes the mod
    * sign-free, so an oracle's UBIGINT `%` matches Spark's `pmod`
    * bit-for-bit). Docs with fewer than `n` tokens yield an empty
    * array. Pure codegen'd in-array transform — no explode needed to
    * SCORE a doc (only the model-count pass explodes).
    */
  def gramBuckets(text: Column, n: Int, numBuckets: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(numBuckets >= 2, s"numBuckets must be >= 2, got $numBuckets")
    // let-bind the token array as a lambda variable (the 1-element
    // transform idiom): higher-order functions evaluate INTERPRETED
    // — outside whole-stage codegen and its subexpression
    // elimination — so a raw `tokens(text)` reference inside the
    // per-gram lambda re-tokenizes the whole doc for every gram
    // (O(tokens²) per doc; measured 3.5 s → 1.1 s on the sf0.1 gram
    // count). The gram string builds from O(1) element_at reads —
    // `slice+array_join` allocates a fresh window array per gram.
    element_at(
      transform(array(Text.tokens(text)), w =>
        when(size(w) >= n,
          transform(sequence(lit(0), size(w) - lit(n)), i =>
            pmod(shiftrightunsigned(SimHash.fnv1a64(
              concat_ws(" ", (0 until n).map(j =>
                element_at(w, (i + lit(j + 1)).cast("int"))): _*)), 1),
              lit(numBuckets.toLong))))
          .otherwise(array().cast("array<bigint>"))), 1)
  }

  /** DSIR bucket-ratio model (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023):
    * per hashed-n-gram bucket b, the add-one-smoothed target/raw
    * probability ratio in micro-units of `unit`, floor-exact —
    * `rmu[b] = unit·(ct[b]+1)·(R+B) // ((cr[b]+1)·(T+B))` with
    * T/R the corpora's total gram counts and B = numBuckets, clamped
    * to `capMu` (one pathological bucket must not own a Long sum;
    * DSIR's selection is robust to weight clipping — the paper clips
    * too, via its Gumbel top-k). Returned as a driver array indexed
    * by bucket — a bounded MODEL FIT (numBuckets rows), the
    * [[Classify]]/[[LmFused]] collect pattern, so SCORING is a pure
    * scan with the model as an array literal: zero shuffles, no join.
    *
    * Exact-integer by construction: both corpora's bucket counts are
    * plain grouped counts (one partial-aggregable exchange each,
    * output ≤ numBuckets rows) and every division is a decimal floor
    * — bit-identical under repartitioning and mirrorable in HUGEINT.
    */
  def importanceRatios(raw: DataFrame, rawText: Column,
      target: DataFrame, targetText: Column, numBuckets: Int = 4096,
      n: Int = 2, unit: Long = 1000000L,
      capMu: Long = 1000000000L): Array[Long] = {
    require(unit > 0, "unit must be positive")
    require(capMu >= unit, s"capMu must be >= unit, got $capMu vs $unit")
    val ct = bucketCounts(target, targetText, n, numBuckets)
    val cr = bucketCounts(raw, rawText, n, numBuckets)
    val tb = BigInt(ct.values.sum) + numBuckets
    val rb = BigInt(cr.values.sum) + numBuckets
    Array.tabulate(numBuckets) { b =>
      val r = BigInt(unit) * (BigInt(ct.getOrElse(b.toLong, 0L)) + 1) * rb /
        ((BigInt(cr.getOrElse(b.toLong, 0L)) + 1) * tb)
      r.min(BigInt(capMu)).toLong
    }
  }

  /** Per-doc DSIR importance weight in micro-units: the mean of the
    * doc's grams' bucket ratios (floor division), `unit` (= ratio 1,
    * neutral) for docs too short to produce a gram. One codegen'd
    * scan — gram buckets and the ratio lookup are in-array transforms
    * against the model literal, the sum a decimal aggregate fold (a
    * Long fold would overflow ANSI at capMu × long docs).
    */
  def importanceWeightCol(text: Column, ratios: Array[Long], n: Int,
      unit: Long = 1000000L): Column =
    weightFromBuckets(gramBuckets(text, n, ratios.length), ratios, unit)

  /** The weight fold over an ALREADY-COMPUTED bucket array — split
    * out so [[importanceResample]] can bind the gram pipeline to a
    * projection column and reference it cheaply (the fold reads its
    * input three times: the empty guard, the sum, the mean divisor —
    * inlined, that would tokenize+hash the doc three times per row;
    * measured 13.5 s → see ROUND11.md for the re-measure).
    */
  private def weightFromBuckets(g: Column, ratios: Array[Long],
      unit: Long): Column = {
    val rl = lit(ratios)
    when(size(g) === 0, lit(unit)).otherwise(
      idiv38(aggregate(g, lit(0L).cast("decimal(38,0)"),
          (acc, b) => acc + dec38(element_at(rl, (b + lit(1L)).cast("int")))),
        dec38(size(g))).cast("long"))
  }

  /** DSIR-style importance resampling in one composition: fit the
    * hashed-n-gram bucket-ratio model ([[importanceRatios]] — two
    * bounded count aggregations), then keep each raw doc with
    * probability `min(1, w / (maxRatio·unit))` where w is its
    * [[importanceWeightCol]] — the [[weightedKeep]] exact-decimal
    * hash threshold, so membership is a pure retry-stable function
    * of (id, salt) exactly like every other sampler here. Raw docs
    * at or above `maxRatio`× target-likeness are kept with
    * certainty; the returned frame is the kept rows of `raw` plus
    * their weight as `ir_w` (the audit column: WHY a doc survived).
    *
    * Scale shape: the selection pass is a pure scan (model is an
    * array literal; no join, no shuffle, no driver loop over docs) —
    * at 100 TB the whole operator is two count aggregates bounded by
    * numBuckets plus one filter-scan of the corpus.
    *
    * This face weighs docs by the ARITHMETIC mean of their gram
    * ratios — chosen for the exact-integer oracle; the paper's own
    * weight is the log-likelihood (geometric) form, shipped as
    * [[importanceResampleLlr]] with the divergence documented there.
    */
  def importanceResample(raw: DataFrame, idCol: Column, textCol: Column,
      target: DataFrame, targetTextCol: Column, numBuckets: Int = 4096,
      n: Int = 2, unit: Long = 1000000L, maxRatio: Long = 4L,
      capMu: Long = 1000000000L, salt: Long = 0L): DataFrame = {
    require(maxRatio >= 1, s"maxRatio must be >= 1, got $maxRatio")
    val ratios = importanceRatios(raw, textCol, target, targetTextCol,
      numBuckets, n, unit, capMu)
    // bind the gram pipeline (tokenize → slice/join → FNV → bucket)
    // to its own projection column: the weight fold and the keep
    // filter then reference attributes, so the doc is tokenized ONCE
    // per row (CollapseProject declines to inline a non-cheap alias
    // referenced multiple times; the filter compares the already-
    // projected weight). Inlined, the scan ran the pipeline 3× per
    // row — measured 13.5 s → 5.3 s on q_sample_dsir at sf0.1.
    raw.withColumn("__ir_g", gramBuckets(textCol, n, numBuckets))
      .withColumn("ir_w", weightFromBuckets(col("__ir_g"), ratios, unit))
      .drop("__ir_g")
      .filter(weightedKeep(idCol, col("ir_w"), maxRatio * unit, salt))
  }

  /** One corpus's hashed-gram bucket histogram: a grouped count whose
    * key space is ≤ numBuckets — the bounded MODEL-FIT collect shared
    * by [[importanceRatios]] and [[importanceLlrModel]].
    */
  private def bucketCounts(df: DataFrame, text: Column, n: Int,
      numBuckets: Int): Map[Long, Long] =
    df.select(explode(gramBuckets(text, n, numBuckets)).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Per-bucket LOG-likelihood-ratio model — the geometric face of
    * [[importanceRatios]], and the form the DSIR paper actually
    * defines (Xie et al. 2023, §3: w(x) = p̂_target(x)/p̂_raw(x) over
    * a PRODUCT of hashed-gram probabilities, i.e. a SUM of per-gram
    * log ratios): `llr[b] = ln(ct[b]+1) − ln(cr[b]+1) + ln(R+B) −
    * ln(T+B)`, clamped to ±`capLn` (the same robustness clipping the
    * arithmetic face applies via capMu — one pathological bucket
    * must not own a doc's weight). Same two bounded count
    * aggregations; doubles here because the log model is inherently
    * real-valued — which is also why this face is spec-verified
    * rather than SQL-oracled (a gate would pin libm ln(), the
    * q_text_lm precedent; the INTEGER face [[importanceRatios]] is
    * the oracle-gated one).
    */
  def importanceLlrModel(raw: DataFrame, rawText: Column,
      target: DataFrame, targetText: Column, numBuckets: Int = 4096,
      n: Int = 2, capLn: Double = math.log(1000.0)): Array[Double] = {
    require(capLn > 0.0, s"capLn must be positive, got $capLn")
    val ct = bucketCounts(target, targetText, n, numBuckets)
    val cr = bucketCounts(raw, rawText, n, numBuckets)
    val norm = math.log(cr.values.sum.toDouble + numBuckets) -
      math.log(ct.values.sum.toDouble + numBuckets)
    Array.tabulate(numBuckets) { b =>
      val v = math.log(ct.getOrElse(b.toLong, 0L) + 1.0) -
        math.log(cr.getOrElse(b.toLong, 0L) + 1.0) + norm
      math.max(-capLn, math.min(capLn, v))
    }
  }

  /** Per-doc mean log-likelihood ratio against an
    * [[importanceLlrModel]]: the log of the GEOMETRIC mean of the
    * doc's gram ratios (where [[importanceWeightCol]] takes the
    * arithmetic mean), 0.0 (= ratio 1, neutral) for gram-less docs.
    * One codegen'd scan, model as an array literal.
    */
  def importanceLlrCol(text: Column, llr: Array[Double], n: Int): Column =
    llrFromBuckets(gramBuckets(text, n, llr.length), llr)

  private def llrFromBuckets(g: Column, llr: Array[Double]): Column = {
    val ll = lit(llr)
    when(size(g) === 0, lit(0.0)).otherwise(
      aggregate(g, lit(0.0),
        (acc, b) => acc + element_at(ll, (b + lit(1L)).cast("int"))) /
        size(g).cast("double"))
  }

  /** DSIR importance resampling under the paper's log-likelihood
    * form — the geometric companion to [[importanceResample]]: keep
    * each raw doc with probability `min(1, exp(llr̄) / maxRatio)`
    * where llr̄ is its [[importanceLlrCol]] mean log ratio, decided
    * by the same [[weightedKeep]] splitmix64 hash (retry/partition-
    * stable membership). The kept frame carries `ir_llr` (the mean
    * log ratio) and `ir_w_geo` (the geometric-mean ratio in
    * micro-units of `unit`, the audit column).
    *
    * Divergence from the arithmetic face, documented: the arithmetic
    * mean is dominated by a doc's BEST buckets (one on-target phrase
    * lifts a mostly-off-target doc), the geometric mean by its WORST
    * (every off-target gram multiplies the weight down) — both shift
    * selection toward the target domain on separated corpora
    * (spec-pinned on the disjoint-vocabulary A/B fixture), but the
    * geometric face punishes mixed-domain docs harder. Same scale
    * shape: two numBuckets-bounded count aggregates + one
    * zero-shuffle filter scan.
    */
  def importanceResampleLlr(raw: DataFrame, idCol: Column, textCol: Column,
      target: DataFrame, targetTextCol: Column, numBuckets: Int = 4096,
      n: Int = 2, unit: Long = 1000000L, maxRatio: Long = 4L,
      capLn: Double = math.log(1000.0), salt: Long = 0L): DataFrame = {
    require(maxRatio >= 1, s"maxRatio must be >= 1, got $maxRatio")
    require(unit > 0, "unit must be positive")
    val llr = importanceLlrModel(raw, textCol, target, targetTextCol,
      numBuckets, n, capLn)
    val cap = maxRatio * unit
    // the same bind-the-gram-pipeline-once projection discipline as
    // the arithmetic face; exp() saturates safely (clamped llr̄ ⇒
    // exp ≤ e^capLn, and least() takes the cap before the long cast)
    raw.withColumn("__ir_g", gramBuckets(textCol, n, numBuckets))
      .withColumn("ir_llr", llrFromBuckets(col("__ir_g"), llr))
      .withColumn("ir_w_geo",
        least(lit(cap).cast("double"),
          exp(col("ir_llr")) * lit(unit.toDouble)).cast("long"))
      .drop("__ir_g")
      .filter(weightedKeep(idCol, col("ir_w_geo"), cap, salt))
  }
}

/** splitmix64 finalizer as a codegen'd unary long→long expression. */
case class Splitmix64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"splitmix64 requires an integral input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    SamplingImpl.splitmix64(input match {
      case l: java.lang.Long => l.longValue
      case i: java.lang.Integer => i.longValue
      case s: java.lang.Short => s.longValue
      case b: java.lang.Byte => b.longValue
    })

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SamplingImpl.splitmix64((long) $c)")

  override protected def withNewChildInternal(newChild: Expression): Splitmix64Expr =
    copy(child = newChild)
}

object SamplingImpl {
  /** The shared splitmix64 finalizer (same constants as
    * [[LshBucketImpl]]/[[MinHashSigExpr]]).
    */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
