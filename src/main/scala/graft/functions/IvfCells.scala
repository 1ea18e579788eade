package graft.functions

import org.apache.spark.sql.{Column, GraftExpr}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Fused IVF cell ranking: the `nprobe` nearest centroids of a vector
  * against a BROADCAST centroid matrix, in ONE codegen'd pass per
  * row — no (vector × centroid) row explosion.
  *
  * Why this exists (measured): the relational formulation
  * (`crossJoin(broadcast(centroids))` + rank window) materializes
  * N·nlist rows EACH CARRYING THE FULL VECTOR into a sort — at 2M
  * vectors / √N=1414 cells that is 2.8×10⁹ ~550-byte rows ≈ 1.5 TB of
  * sort spill, which filled the disk and killed the run (SCALE.md,
  * third embeddings decade). The same arithmetic as a fused argmax is
  * ~10¹¹ multiply-adds with ZERO shuffle rows — the PqEncodeExpr
  * pattern applied to the coarse quantizer.
  *
  * Parity contract: per (vector, centroid) the cosine is computed with
  * CosineSimExpr's exact operation order (left-to-right dot and norms,
  * one divide), and ranking uses Spark's total double order
  * (java.lang.Double.compare: NaN greatest) with the id-ascending
  * tie-break — so results are BIT-IDENTICAL to the window formulation
  * the gates were verified against.
  */
object IvfCells {
  def top_cells(vec: Column, cids: Array[Long], cents: Array[Double],
      dim: Int, k: Int): Column =
    GraftExpr.column(IvfTopCellsExpr(GraftExpr.expression(vec), cids, cents, dim, k))
}

case class IvfTopCellsExpr(child: Expression, cids: Array[Long],
    cents: Array[Double], dim: Int, k: Int) extends UnaryExpression {
  require(cids.nonEmpty && cents.length == cids.length * dim,
    s"centroid matrix shape mismatch: ${cids.length} ids × $dim dims vs ${cents.length}")
  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ivf_top_cells requires array<float|double>, got $t")
  }

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    IvfCellsImpl.topCells(input.asInstanceOf[ArrayData], isFloat, cids, cents, dim, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("ivfCids", cids)
    val centsRef = ctx.addReferenceObj("ivfCents", cents)
    val fl = if (isFloat) "true" else "false"
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.IvfCellsImpl.topCells($c, $fl, $cidsRef, $centsRef, $dim, $k)")
  }

  override protected def withNewChildInternal(c: Expression): IvfTopCellsExpr =
    copy(child = c)
}

object IvfCellsImpl {
  /** Top-k cells by (sim desc, cid asc) under Spark's total double
    * order — a small insertion-sorted buffer (k is nprobe-sized).
    */
  def topCells(vec: ArrayData, isFloat: Boolean, cids: Array[Long],
      cents: Array[Double], dim: Int, k: Int): ArrayData = {
    val n = math.min(vec.numElements(), dim)
    val nlist = cids.length
    val kk = math.min(k, nlist)
    val topSim = new Array[Double](kk)
    val topCid = new Array[Long](kk)
    var filled = 0
    var c = 0
    while (c < nlist) {
      // CosineSimExpr's exact operation order per pair
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val off = c * dim
      while (i < n) {
        val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        val y = cents(off + i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val sim = dot / (math.sqrt(na) * math.sqrt(nb))
      val cid = cids(c)
      // insertion position: better = greater sim (NaN greatest), tie →
      // smaller cid
      var pos = filled
      while (pos > 0 && {
        val cmp = java.lang.Double.compare(sim, topSim(pos - 1))
        cmp > 0 || (cmp == 0 && cid < topCid(pos - 1))
      }) pos -= 1
      if (pos < kk) {
        val last = math.min(filled, kk - 1)
        var j = last
        while (j > pos) { topSim(j) = topSim(j - 1); topCid(j) = topCid(j - 1); j -= 1 }
        topSim(pos) = sim; topCid(pos) = cid
        if (filled < kk) filled += 1
      }
      c += 1
    }
    val out = new Array[Any](filled)
    var j = 0
    while (j < filled) {
      out(j) = InternalRow(topCid(j), topSim(j))
      j += 1
    }
    new GenericArrayData(out)
  }
}
