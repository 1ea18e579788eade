package graft.functions

import org.apache.spark.sql.{Column, GraftExpr}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused cosine similarity over two array<float>/array<double> columns —
  * a custom Catalyst `BinaryExpression` with `doGenCode`. One pass, no
  * intermediate arrays; stays inside whole-stage codegen (the
  * `zip_with`+`aggregate` composition is CodegenFallback and ~10×
  * slower on brute-force ANN scans).
  *
  * Accumulation is left-to-right in double, matching
  * [[Similarity.cosine]] exactly.
  */
case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float|double>, got ${left.dataType}, ${right.dataType}")

  private val leftIsFloat = () => left.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }
  private val rightIsFloat = () => right.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (leftIsFloat() && rightIsFloat()) CosineSimImpl.cosineFF(x, y)
    else if (leftIsFloat()) CosineSimImpl.cosineFD(x, y)
    else if (rightIsFloat()) CosineSimImpl.cosineDF(x, y)
    else CosineSimImpl.cosineDD(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn =
      if (leftIsFloat() && rightIsFloat()) "cosineFF"
      else if (leftIsFloat()) "cosineFD"
      else if (rightIsFloat()) "cosineDF"
      else "cosineDD"
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CosineSimImpl.$fn($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimImpl {
  def cosineFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineDF(a: ArrayData, b: ArrayData): Double = cosineFD(b, a) match {
    case _ =>
      // dot is symmetric but norms aren't positional — compute directly
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = a.getDouble(i)
        val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

object CosineSim {
  /** cosine_sim(a, b): fused codegen'd cosine similarity. */
  def cosine_sim(a: Column, b: Column): Column =
    GraftExpr.column(CosineSimExpr(GraftExpr.expression(a), GraftExpr.expression(b)))
}
