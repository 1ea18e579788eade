package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{Adler32Expr, CosineSimExpr, LshBucketExpr, MinHashSigExpr, NgramStatsExpr, ShinglesExpr, SimHash64, TokenCountExpr, TokenLengthSumExpr}

/** SQL surface for graft's custom Catalyst expressions. Two ways in:
  *
  *  - cluster deployment: `--conf spark.sql.extensions=graft.GraftExtensions`
  *  - existing session: `GraftExtensions.register(spark)`
  *
  * Registered functions: `simhash64(array<string>)`,
  * `minhash_sig(array<string>, numHashes)`, `cosine_sim(vec, vec)`,
  * `lsh_bucket(vec, bits)`, `token_count(str)`, `token_length_sum(str)`,
  * `shingles(str, n)`, `adler32(str)`, `ngram_stats(str, n)`,
  * `winnow(str, k, w)`.
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
        intArg(es(1), "k"), intArg(es(2), "w"))))

  /** Register the functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
    }
}
