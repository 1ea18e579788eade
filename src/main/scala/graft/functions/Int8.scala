package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftExpr}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Int8 scalar quantization of embedding columns — the 4×-compression
  * serving tier BETWEEN raw float32 and PQ codes ([[PqModel]]): no
  * trained model, near-exact cosine (the per-vector max-abs scale
  * cancels out of cosine entirely), and the candidate-scoring dot
  * product becomes an EXACT integer sum — which is also what makes the
  * operator fully DuckDB-oracle-able where float dots need
  * order-pinned folds.
  *
  * Storage contract: `codes` is array<tinyint> (1 byte/dim in parquet
  * vs 4 for float) plus an optional [[Int8.int8Scale]] double per
  * vector for value reconstruction. Quantization is symmetric
  * round-to-nearest: `c_i = floor(v_i·127/maxabs + 0.5)` — one shared
  * formula, rendered operation-for-operation in the oracle so the
  * boundary rounding can never drift between engines. Cosine over
  * codes needs NO scales: cos = Σab / √(Σa²·Σb²), all three sums
  * exact integers.
  */
object Int8 {

  /** Quantize an array<float|double> vector to array<tinyint> codes
    * (fused codegen'd scan, one pass for maxabs + one for codes).
    */
  def int8Codes(vec: Column): Column =
    GraftExpr.column(Int8QuantizeExpr(GraftExpr.expression(vec)))

  /** The per-vector dequantization scale maxabs/127 (pure built-in
    * composition — only needed for value reconstruction, never for
    * cosine ranking).
    */
  def int8Scale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double")))) / lit(127.0)

  /** Exact integer dot product of two code vectors. */
  def int8Dot(a: Column, b: Column): Column =
    GraftExpr.column(Int8DotExpr(GraftExpr.expression(a), GraftExpr.expression(b)))

  /** Cosine over int8 codes — scale-free (the max-abs scales cancel),
    * double only in the final normalize of three exact integer sums.
    */
  def int8Cosine(a: Column, b: Column): Column =
    int8Dot(a, b).cast("double") /
      (sqrt(int8Dot(a, a).cast("double")) * sqrt(int8Dot(b, b).cast("double")))

  /** Brute-force top-k by int8 cosine — the spec baseline and the
    * small-corpus path; the 100 TB path buckets candidates first
    * ([[int8TopK]]).
    */
  def bruteForceInt8TopK(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val coded = df.select(col(idCol).as("id"), int8Codes(col(vecCol)).as("c"))
    val joined = coded.select(col("id").as("qid"), col("c").as("qc"))
      .crossJoin(coded.select(col("id").as("nid"), col("c").as("nc")))
      .filter(col("qid") =!= col("nid"))
      .withColumn("sim", int8Cosine(col("qc"), col("nc")))
    rankTopK(joined, k)
  }

  /** LSH-bucketed int8 top-k: candidates from a random-hyperplane
    * bucket on the RAW vectors ([[Similarity.lshBucket]] — computed
    * once, before compression), scoring inside the bucket on the int8
    * codes. The IVFADC shape at the scalar-quantization tier: the
    * float corpus never joins against itself — only (bucket, id,
    * codes) rows shuffle, 4× smaller than the raw-vector join of
    * [[Similarity.lshTopK]].
    */
  def int8TopK(df: DataFrame, idCol: String, vecCol: String, k: Int, bits: Int): DataFrame = {
    val coded = df.select(col(idCol).as("id"),
      Similarity.lshBucket(col(vecCol), bits).as("bucket"),
      int8Codes(col(vecCol)).as("c"))
    val joined = coded.select(col("bucket"), col("id").as("qid"), col("c").as("qc"))
      .join(coded.select(col("bucket"), col("id").as("nid"), col("c").as("nc")), Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("sim", int8Cosine(col("qc"), col("nc")))
    rankTopK(joined, k)
  }

  /** [[int8TopK]] with bits from [[Similarity.autoBits]]. */
  def int8TopKAuto(df: DataFrame, idCol: String, vecCol: String, k: Int,
      targetBucket: Int = 64): DataFrame =
    int8TopK(df, idCol, vecCol, k, Similarity.autoBits(df.count(), targetBucket))

  /** PERSISTABLE int8 index — the build-once/serve-many contract at
    * the scalar-quantization tier: (bucket, id, codes), 4× smaller
    * than the float corpus, model-free (nothing to version except
    * `bits`; quantization is a pure per-vector function, so
    * incremental drops encode independently and append). Persist
    * partitioned by bucket for cell pruning at serve time.
    */
  def int8Index(df: DataFrame, idCol: String, vecCol: String, bits: Int): DataFrame =
    df.select(
      Similarity.lshBucket(col(vecCol), bits).as("bucket"),
      col(idCol).as("id"),
      int8Codes(col(vecCol)).as("c"))

  /** Query a persisted [[int8Index]]: queries bucket + quantize with
    * the SAME `bits`, join the index on bucket, score by exact-integer
    * int8 cosine, rank via the map-side top-k. Bit-identical to the
    * one-shot [[int8TopK]] at the same bits (spec-pinned).
    */
  def int8QueryIndex(queries: DataFrame, qId: String, qVec: String,
      bits: Int, index: DataFrame, k: Int): DataFrame = {
    val q = queries.select(
      Similarity.lshBucket(col(qVec), bits).as("bucket"),
      col(qId).as("qid"),
      int8Codes(col(qVec)).as("qc"))
    val joined = q
      .join(index.select(col("bucket"), col("id").as("nid"), col("c").as("nc")),
        Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("sim", int8Cosine(col("qc"), col("nc")))
    rankTopK(joined, k)
  }

  private def rankTopK(joined: DataFrame, k: Int): DataFrame =
    Similarity.rankTopK(joined.select(col("qid"), col("nid"), col("sim")), k)
      .select(col("qid"), col("nid"), col("sim"), col("rank"))
}

/** array<float|double> → array<tinyint> symmetric round-to-nearest
  * codes (`floor(v·127/maxabs + 0.5)`, clamped; all-zero vector →
  * all-zero codes).
  */
case class Int8QuantizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"int8_quantize requires array<float|double>, got $t")
  }

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (isFloat) Int8Impl.quantizeF(a) else Int8Impl.quantizeD(a)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "quantizeF" else "quantizeD"
    defineCodeGen(ctx, ev, c => s"graft.functions.Int8Impl.$fn($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Int8QuantizeExpr =
    copy(child = newChild)
}

/** Exact integer dot of two array<tinyint> code vectors (long — no
  * overflow below 2^49 dims).
  */
case class Int8DotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(ByteType, _) => true; case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int8_dot requires array<tinyint>, got ${left.dataType}, ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    Int8Impl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Int8Impl.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Int8DotExpr =
    copy(left = newLeft, right = newRight)
}

object Int8Impl {
  def quantizeF(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(a.getFloat(i).toDouble)
      if (x > maxabs) maxabs = x
      i += 1
    }
    val out = new Array[Byte](n)
    if (maxabs > 0.0) {
      i = 0
      while (i < n) {
        out(i) = code(a.getFloat(i).toDouble, maxabs)
        i += 1
      }
    }
    new GenericArrayData(out.map(b => b: java.lang.Byte).asInstanceOf[Array[Any]])
  }

  def quantizeD(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(a.getDouble(i))
      if (x > maxabs) maxabs = x
      i += 1
    }
    val out = new Array[Byte](n)
    if (maxabs > 0.0) {
      i = 0
      while (i < n) {
        out(i) = code(a.getDouble(i), maxabs)
        i += 1
      }
    }
    new GenericArrayData(out.map(b => b: java.lang.Byte).asInstanceOf[Array[Any]])
  }

  /** floor(x·127/maxabs + 0.5) clamped to [-127, 127] — the ONE
    * rounding formula, operation order identical to the oracle SQL.
    */
  private def code(x: Double, maxabs: Double): Byte = {
    val c = math.floor(x * 127.0 / maxabs + 0.5)
    (if (c < -127.0) -127 else if (c > 127.0) 127 else c.toInt).toByte
  }

  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    s
  }
}
