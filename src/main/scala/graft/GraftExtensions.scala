package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{Adler32Expr, BloomBitsExpr, BloomContainsExpr, BloomMergeAgg, BloomSketchAgg, CmsCountersExpr, CmsEstimateExpr, CmsMergeAgg, CmsSketchAgg, CorpusMinHashAgg, CorpusSigMergeAgg, CosineSimExpr, Fnv1a64Expr, HistAgg, HistMergeAgg, HistQuantileSlotExpr, HistQuantileValueExpr, HllEstimateExpr, HllMergeAgg, HllRegistersExpr, HllSketchAgg, LshBucketExpr, MinHashSigExpr, NgramStatsExpr, ShinglesExpr, SimHash64, Splitmix64Expr, TokenCountExpr, TokenLengthSumExpr}

/** SQL surface for graft's custom Catalyst expressions. Two ways in:
  *
  *  - cluster deployment: `--conf spark.sql.extensions=graft.GraftExtensions`
  *  - existing session: `GraftExtensions.register(spark)`
  *
  * Registered functions: `simhash64(array<string>)`,
  * `minhash_sig(array<string>, numHashes)`, `cosine_sim(vec, vec)`,
  * `lsh_bucket(vec, bits)`, `token_count(str)`, `token_length_sum(str)`,
  * `shingles(str, n)`, `adler32(str)`, `ngram_stats(str, n)`,
  * `winnow(str, k, w)`, the hash helpers `fnv1a64(str)` /
  * `splitmix64(long)`, and the full mergeable sketch suite as SQL
  * aggregates + scalars: `hll_sketch(hash, p)` / `hll_merge` /
  * `hll_estimate` / `hll_registers`, `cms_sketch(hash, weight, d, w)`
  * / `cms_merge` / `cms_estimate(sk, hash)` / `cms_counters`,
  * `bloom_sketch(hash, m, k)` / `bloom_merge` /
  * `bloom_contains(sk, hash)` / `bloom_bits`,
  * `corpus_minhash(hash, k)` / `corpus_minhash_merge`,
  * `hist_sketch(value, lo, hi, nbins)` / `hist_merge` /
  * `hist_quantile_slot(h, q)` / `hist_quantile_value(h, q, lo, hi, nbins)`
  * — so a pure-SQL user can build, merge, and probe per-shard corpus
  * statistics with `spark.sql` alone.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  def apply(e: SparkSessionExtensions): Unit =
    builders.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  private def doubleArg(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: Int, _) => v.toDouble
    case other => throw new IllegalArgumentException(s"$what must be a numeric literal, got $other")
  }

  private[graft] val builders: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (es: Seq[Expression]) => SimHash64(es.head)),
    ("minhash_sig",
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
      (es: Seq[Expression]) => MinHashSigExpr(es.head, intArg(es(1), "numHashes"))),
    ("cosine_sim",
      new ExpressionInfo(classOf[CosineSimExpr].getName, "cosine_sim"),
      (es: Seq[Expression]) => CosineSimExpr(es.head, es(1))),
    ("lsh_bucket",
      new ExpressionInfo(classOf[LshBucketExpr].getName, "lsh_bucket"),
      (es: Seq[Expression]) => LshBucketExpr(es.head, intArg(es(1), "bits"))),
    ("token_count",
      new ExpressionInfo(classOf[TokenCountExpr].getName, "token_count"),
      (es: Seq[Expression]) => TokenCountExpr(es.head)),
    ("token_length_sum",
      new ExpressionInfo(classOf[TokenLengthSumExpr].getName, "token_length_sum"),
      (es: Seq[Expression]) => TokenLengthSumExpr(es.head)),
    ("shingles",
      new ExpressionInfo(classOf[ShinglesExpr].getName, "shingles"),
      (es: Seq[Expression]) => ShinglesExpr(es.head, intArg(es(1), "n"))),
    ("adler32",
      new ExpressionInfo(classOf[Adler32Expr].getName, "adler32"),
      (es: Seq[Expression]) => Adler32Expr(es.head)),
    ("ngram_stats",
      new ExpressionInfo(classOf[NgramStatsExpr].getName, "ngram_stats"),
      (es: Seq[Expression]) => NgramStatsExpr(es.head, intArg(es(1), "n"))),
    ("winnow",
      new ExpressionInfo(classOf[graft.functions.WinnowExpr].getName, "winnow"),
      (es: Seq[Expression]) => graft.functions.WinnowExpr(es.head,
        intArg(es(1), "k"), intArg(es(2), "w"))),
    ("fnv1a64",
      new ExpressionInfo(classOf[Fnv1a64Expr].getName, "fnv1a64"),
      (es: Seq[Expression]) => Fnv1a64Expr(es.head)),
    ("splitmix64",
      new ExpressionInfo(classOf[Splitmix64Expr].getName, "splitmix64"),
      (es: Seq[Expression]) => Splitmix64Expr(es.head)),
    ("hll_sketch",
      new ExpressionInfo(classOf[HllSketchAgg].getName, "hll_sketch"),
      (es: Seq[Expression]) => HllSketchAgg(es.head, intArg(es(1), "p"))),
    ("hll_merge",
      new ExpressionInfo(classOf[HllMergeAgg].getName, "hll_merge"),
      (es: Seq[Expression]) => HllMergeAgg(es.head)),
    ("hll_estimate",
      new ExpressionInfo(classOf[HllEstimateExpr].getName, "hll_estimate"),
      (es: Seq[Expression]) => HllEstimateExpr(es.head)),
    ("hll_registers",
      new ExpressionInfo(classOf[HllRegistersExpr].getName, "hll_registers"),
      (es: Seq[Expression]) => HllRegistersExpr(es.head)),
    ("cms_sketch",
      new ExpressionInfo(classOf[CmsSketchAgg].getName, "cms_sketch"),
      (es: Seq[Expression]) => CmsSketchAgg(es.head, es(1),
        intArg(es(2), "depth"), intArg(es(3), "width"))),
    ("cms_merge",
      new ExpressionInfo(classOf[CmsMergeAgg].getName, "cms_merge"),
      (es: Seq[Expression]) => CmsMergeAgg(es.head)),
    ("cms_estimate",
      new ExpressionInfo(classOf[CmsEstimateExpr].getName, "cms_estimate"),
      (es: Seq[Expression]) => CmsEstimateExpr(es.head, es(1))),
    ("cms_counters",
      new ExpressionInfo(classOf[CmsCountersExpr].getName, "cms_counters"),
      (es: Seq[Expression]) => CmsCountersExpr(es.head)),
    ("bloom_sketch",
      new ExpressionInfo(classOf[BloomSketchAgg].getName, "bloom_sketch"),
      (es: Seq[Expression]) => BloomSketchAgg(es.head,
        intArg(es(1), "m"), intArg(es(2), "k"))),
    ("bloom_merge",
      new ExpressionInfo(classOf[BloomMergeAgg].getName, "bloom_merge"),
      (es: Seq[Expression]) => BloomMergeAgg(es.head)),
    ("bloom_contains",
      new ExpressionInfo(classOf[BloomContainsExpr].getName, "bloom_contains"),
      (es: Seq[Expression]) => BloomContainsExpr(es.head, es(1))),
    ("bloom_bits",
      new ExpressionInfo(classOf[BloomBitsExpr].getName, "bloom_bits"),
      (es: Seq[Expression]) => BloomBitsExpr(es.head)),
    ("corpus_minhash",
      new ExpressionInfo(classOf[CorpusMinHashAgg].getName, "corpus_minhash"),
      (es: Seq[Expression]) => CorpusMinHashAgg(es.head, intArg(es(1), "k"))),
    ("corpus_minhash_merge",
      new ExpressionInfo(classOf[CorpusSigMergeAgg].getName, "corpus_minhash_merge"),
      (es: Seq[Expression]) => CorpusSigMergeAgg(es.head)),
    ("hist_sketch",
      new ExpressionInfo(classOf[HistAgg].getName, "hist_sketch"),
      (es: Seq[Expression]) => HistAgg(es.head, doubleArg(es(1), "lo"),
        doubleArg(es(2), "hi"), intArg(es(3), "nbins"))),
    ("hist_merge",
      new ExpressionInfo(classOf[HistMergeAgg].getName, "hist_merge"),
      (es: Seq[Expression]) => HistMergeAgg(es.head)),
    ("hist_quantile_slot",
      new ExpressionInfo(classOf[HistQuantileSlotExpr].getName, "hist_quantile_slot"),
      (es: Seq[Expression]) => HistQuantileSlotExpr(es.head, doubleArg(es(1), "q"))),
    ("hist_quantile_value",
      new ExpressionInfo(classOf[HistQuantileValueExpr].getName, "hist_quantile_value"),
      (es: Seq[Expression]) => HistQuantileValueExpr(es.head, doubleArg(es(1), "q"),
        doubleArg(es(2), "lo"), doubleArg(es(3), "hi"), intArg(es(4), "nbins"))),
    ("kmv_sample",
      new ExpressionInfo(classOf[graft.functions.KmvSampleAgg].getName, "kmv_sample"),
      (es: Seq[Expression]) => graft.functions.KmvSampleAgg(es.head, es(1), intArg(es(2), "k"))),
    ("kmv_merge",
      new ExpressionInfo(classOf[graft.functions.KmvMergeAgg].getName, "kmv_merge"),
      (es: Seq[Expression]) => graft.functions.KmvMergeAgg(es.head, intArg(es(1), "k"))),
    ("int8_quantize",
      new ExpressionInfo(classOf[graft.functions.Int8QuantizeExpr].getName, "int8_quantize"),
      (es: Seq[Expression]) => graft.functions.Int8QuantizeExpr(es.head)),
    ("int8_dot",
      new ExpressionInfo(classOf[graft.functions.Int8DotExpr].getName, "int8_dot"),
      (es: Seq[Expression]) => graft.functions.Int8DotExpr(es.head, es(1))),
    ("dhash",
      new ExpressionInfo(classOf[graft.functions.DhashExpr].getName, "dhash"),
      (es: Seq[Expression]) => graft.functions.DhashExpr(es.head, intArg(es(1), "target"))),
    ("top_k_by",
      new ExpressionInfo(classOf[graft.functions.TopKByAgg].getName, "top_k_by"),
      (es: Seq[Expression]) => graft.functions.TopKByAgg(es.head, es(1),
        intArg(es(2), "k")).toAggregateExpression()))

  /** Register the functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
    }
}
