package graft.functions

import org.apache.spark.sql.{Column, GraftExpr}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd token scans — single-pass replacements for the
  * `filter(split(text, "\\s+"), t -> t != '')` compositions, whose
  * higher-order lambdas evaluate interpreted (see PlanSpec/SCALE.md).
  * Semantics match Java regex `\s` exactly: a token is a maximal run
  * of non-[ \t\n\x0B\f\r] characters.
  */
private[functions] trait TextScanExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected string input, got $t")
  }
}

/** Count of whitespace-separated non-empty tokens. */
case class TokenCountExpr(child: Expression) extends TextScanExpr {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    TokenScanImpl.tokenCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenScanImpl.tokenCount($c)")
  override protected def withNewChildInternal(c: Expression): TokenCountExpr = copy(child = c)
}

/** Sum of token lengths in characters. */
case class TokenLengthSumExpr(child: Expression) extends TextScanExpr {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TokenScanImpl.tokenLengthSum(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenScanImpl.tokenLengthSum($c)")
  override protected def withNewChildInternal(c: Expression): TokenLengthSumExpr = copy(child = c)
}

/** Count of tokens (duplicates included) contained in `words`. */
case class StopwordHitsExpr(child: Expression, words: Seq[String]) extends TextScanExpr {
  override def dataType: DataType = IntegerType

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    words.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    TokenScanImpl.stopwordHits(input.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopwords", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenScanImpl.stopwordHits($c, $setRef)")
  }

  override protected def withNewChildInternal(c: Expression): StopwordHitsExpr = copy(child = c)
}

/** Deflate-compressed byte length of a string (zlib level 6, raw
  * deflate) — the compressibility quality signal: highly repetitive
  * boilerplate compresses far below natural text, random noise far
  * above (Dolma/RefinedWeb-style filters threshold the ratio
  * compressed/raw from both sides). Deterministic for a given input
  * (fixed level and strategy), codegen'd, one thread-local Deflater
  * per executor thread — no per-row allocation. Spec-only surface:
  * DuckDB has no SQL zlib to oracle against.
  */
case class DeflateSizeExpr(child: Expression) extends TextScanExpr {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    TokenScanImpl.deflateSize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenScanImpl.deflateSize($c)")
  override protected def withNewChildInternal(c: Expression): DeflateSizeExpr = copy(child = c)
}

/** The token array itself (whitespace-separated, empties dropped) —
  * feeds simhash; same semantics as `filter(split(text, "\\s+"), ...)`.
  */
case class TokensExpr(child: Expression) extends TextScanExpr {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TokenScanImpl.tokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenScanImpl.tokens($c)")
  override protected def withNewChildInternal(c: Expression): TokensExpr = copy(child = c)
}

/** Word n-gram repetition stats in one fused pass:
  * struct(n_grams, n_distinct, top_count) — the inputs to Gopher-style
  * duplicate-n-gram quality filters (Rae et al. 2021, "Scaling Language
  * Models: ... Gopher", appendix A1: fraction-of-duplicate-n-grams and
  * top-n-gram-fraction repetition signals). One tokenizer scan + one
  * open-hash count per row; the equivalent
  * size/array_distinct/array_max-of-filter composition re-walks the
  * gram array O(distinct · grams) times through interpreted lambdas.
  */
case class NgramStatsExpr(child: Expression, n: Int) extends TextScanExpr {
  require(n >= 1, s"n must be >= 1, got $n")
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_grams", IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("n_distinct", IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("top_count", IntegerType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    TokenScanImpl.ngramStats(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenScanImpl.ngramStats($c, $n)")
  override protected def withNewChildInternal(c: Expression): NgramStatsExpr = copy(child = c)
}

object TokenScanImpl {
  // Java regex \s character class (non-unicode mode)
  private[functions] def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def tokenCount(s: UTF8String): Int = {
    val str = s.toString
    var count = 0
    var inTok = false
    var i = 0
    while (i < str.length) {
      if (isWs(str.charAt(i))) inTok = false
      else if (!inTok) { count += 1; inTok = true }
      i += 1
    }
    count
  }

  def tokenLengthSum(s: UTF8String): Long = {
    val str = s.toString
    var sum = 0L
    var i = 0
    while (i < str.length) {
      if (!isWs(str.charAt(i))) sum += 1
      i += 1
    }
    sum
  }

  def tokens(s: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val str = s.toString
    val out = new java.util.ArrayList[Any]()
    var start = -1
    var i = 0
    while (i <= str.length) {
      val ws = i == str.length || isWs(str.charAt(i))
      if (!ws && start < 0) start = i
      else if (ws && start >= 0) {
        out.add(UTF8String.fromString(str.substring(start, i)))
        start = -1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  def ngramStats(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    val toks = new java.util.ArrayList[String]()
    var start = -1
    var i = 0
    while (i <= str.length) {
      val ws = i == str.length || isWs(str.charAt(i))
      if (!ws && start < 0) start = i
      else if (ws && start >= 0) { toks.add(str.substring(start, i)); start = -1 }
      i += 1
    }
    val total = toks.size - n + 1
    if (total <= 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0, 0, 0))
    val counts = new java.util.HashMap[String, Int](total * 2)
    var top = 0
    var g = 0
    val sb = new java.lang.StringBuilder()
    while (g < total) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks.get(g + k))
        k += 1
      }
      val c = counts.merge(sb.toString, 1, (a, b) => a + b)
      if (c > top) top = c
      g += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total, counts.size, top))
  }

  def stopwordHits(s: UTF8String, set: java.util.HashSet[String]): Int = {
    val str = s.toString
    var count = 0
    var start = -1
    var i = 0
    while (i <= str.length) {
      val ws = i == str.length || isWs(str.charAt(i))
      if (!ws && start < 0) start = i
      else if (ws && start >= 0) {
        if (set.contains(str.substring(start, i))) count += 1
        start = -1
      }
      i += 1
    }
    count
  }

  private val deflaterTl = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }
  private val deflateBufTl = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](1 << 16)
  }

  def deflateSize(s: UTF8String): Int = {
    val d = deflaterTl.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val buf = deflateBufTl.get()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

object TokenExprs {
  def token_count(text: Column): Column =
    GraftExpr.column(TokenCountExpr(GraftExpr.expression(text)))
  def token_length_sum(text: Column): Column =
    GraftExpr.column(TokenLengthSumExpr(GraftExpr.expression(text)))
  def stopword_hits(text: Column, words: Seq[String]): Column =
    GraftExpr.column(StopwordHitsExpr(GraftExpr.expression(text), words))
  def tokens(text: Column): Column =
    GraftExpr.column(TokensExpr(GraftExpr.expression(text)))
  def ngram_stats(text: Column, n: Int): Column =
    GraftExpr.column(NgramStatsExpr(GraftExpr.expression(text), n))
  def deflate_size(text: Column): Column =
    GraftExpr.column(DeflateSizeExpr(GraftExpr.expression(text)))
}
