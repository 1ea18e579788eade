package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftExpr}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Optimized Product Quantization (Ge, He, Ke, Sun, "Optimized
  * Product Quantization", CVPR'13 — the parametric solution): learn
  * an ORTHOGONAL rotation R that balances variance across the m PQ
  * subspaces, then product-quantize in the rotated space. Plain PQ
  * quantizes whatever coordinates the data arrives in; when variance
  * is concentrated in a few correlated dimensions that land in one
  * subspace (the usual shape of learned embeddings), that subspace
  * burns its whole codebook while the rest quantize noise. The
  * parametric OPQ fix is PCA + greedy EIGENVALUE ALLOCATION: assign
  * principal directions to subspaces so each subspace's variance
  * product is balanced, R = the permuted eigenbasis.
  *
  * R is orthogonal, so `dot(Rx, Ry) = dot(x, y)`: ADC scores computed
  * in the rotated space estimate the ORIGINAL inner product — callers
  * compare/rank exactly as with plain PQ, no un-rotation anywhere.
  *
  * Scale shape: training is a bounded model fit on the SAME
  * deterministic sample as [[PqModel.train]] (d×d covariance +
  * eigendecomposition on the driver — 64×64 here; the data never
  * moves). Serving adds one codegen'd mat-vec ([[MatVecExpr]],
  * d² multiply-adds) on each side of the candidate join; codes stay
  * m bytes. The rotation persists beside the codebook
  * ([[Opq.toDF]]/[[Opq.fromDF]]) under the same
  * build-once/serve-many contract — stored codes never invalidate.
  */
object Opq {

  /** R (dim×dim, row-major) + the PQ codebook trained in R-space. */
  final case class OpqModel(rotation: Array[Double], dim: Int, pq: PqModel)
      extends Serializable {
    require(rotation.length == dim * dim,
      s"rotation length ${rotation.length} != dim² ${dim * dim}")
    require(pq.dim == dim, s"pq dim ${pq.dim} != rotation dim $dim")
  }

  /** Train rotation + codebook from one bounded sample: covariance →
    * eigendecomposition → greedy balanced allocation (largest
    * eigenvalue first, into the least-loaded non-full subspace by
    * log-variance product) → per-subspace Lloyd on the rotated
    * sample.
    */
  def train(df: DataFrame, idCol: Column, vecCol: Column, m: Int, ksub: Int,
      iterations: Int = 4, sampleN: Int = 16384, seed: Long = 0L): OpqModel = {
    val sample = PqModel.sampleVectors(df, idCol, vecCol, sampleN, seed)
    require(sample.nonEmpty, "opq train: empty input")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must be a multiple of m $m")
    val r = rotationFromSample(sample, dim, m)
    val rotated = sample.map(v => OpqImpl.matvec(r, v))
    OpqModel(r, dim, PqModel.trainFromSample(rotated, m, ksub, iterations))
  }

  /** PCA + eigenvalue allocation on an in-memory sample; returns R
    * row-major (row i = the eigenvector assigned to rotated
    * coordinate i, subspace s owning rows [s·subdim, (s+1)·subdim)).
    */
  private[functions] def rotationFromSample(sample: Array[Array[Double]],
      dim: Int, m: Int): Array[Double] = {
    val n = sample.length
    val mean = new Array[Double](dim)
    sample.foreach { v => var d = 0; while (d < dim) { mean(d) += v(d); d += 1 } }
    var d = 0
    while (d < dim) { mean(d) /= n; d += 1 }
    val cov = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
    sample.foreach { v =>
      var i = 0
      while (i < dim) {
        val ci = v(i) - mean(i)
        var j = i
        while (j < dim) {
          cov(i, j) += ci * (v(j) - mean(j)); j += 1
        }
        i += 1
      }
    }
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        cov(i, j) /= n; cov(j, i) = cov(i, j); j += 1
      }
      i += 1
    }
    val es = breeze.linalg.eigSym(cov)
    // eigenpairs descending by eigenvalue
    val order = (0 until dim).sortBy(k => -es.eigenvalues(k))
    val subdim = dim / m
    // greedy allocation: next-largest eigenvalue → the non-full
    // subspace with the smallest Σ log λ (≙ smallest variance product)
    val loads = new Array[Double](m)
    val fill = new Array[Int](m)
    val assign = Array.ofDim[Int](m, subdim)
    order.foreach { k =>
      val lam = math.max(es.eigenvalues(k), 1e-12)
      var best = -1
      var s = 0
      while (s < m) {
        if (fill(s) < subdim && (best < 0 || loads(s) < loads(best))) best = s
        s += 1
      }
      assign(best)(fill(best)) = k
      fill(best) += 1
      loads(best) += math.log(lam)
    }
    val r = new Array[Double](dim * dim)
    var s = 0
    while (s < m) {
      var t = 0
      while (t < subdim) {
        val k = assign(s)(t)
        val row = s * subdim + t
        var c = 0
        while (c < dim) { r(row * dim + c) = es.eigenvectors(c, k); c += 1 }
        t += 1
      }
      s += 1
    }
    r
  }

  /** R·v as a codegen'd column (array<double>). */
  def rotate(vec: Column, model: OpqModel): Column =
    GraftExpr.column(MatVecExpr(GraftExpr.expression(vec), model.rotation, model.dim))

  /** OPQ code of a raw (un-rotated) vector — binary(m). */
  def encode(vec: Column, model: OpqModel): Column =
    Pq.pq_encode(rotate(vec, model), model.pq)

  /** Direct ADC score of a raw query against an OPQ code ≈ the
    * ORIGINAL inner product (orthogonality). */
  def adcScore(queryVec: Column, codes: Column, model: OpqModel): Column =
    Pq.adc_score(rotate(queryVec, model), codes, model.pq)

  /** Bucketed OPQ top-k: [[Similarity.pqTopK]] in the rotated space
    * (LSH buckets over rotated vectors; rotation happens once per
    * side before the join, not per candidate).
    */
  def opqTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
      model: OpqModel, targetBucket: Int = 64): DataFrame = {
    val rotated = df.select(col(idCol).as(idCol), rotate(col(vecCol), model).as(vecCol))
    Similarity.pqTopK(rotated, idCol, vecCol, k, model.pq,
      Similarity.lshBucket(col(vecCol), Similarity.autoBits(df.count(), targetBucket)))
  }

  /** Train + serve in one call (the pqTopKAuto shape). */
  def opqTopKAuto(df: DataFrame, idCol: String, vecCol: String, k: Int,
      m: Int = 8, ksub: Int = 256, targetBucket: Int = 64): DataFrame =
    opqTopK(df, idCol, vecCol, k,
      train(df, col(idCol), col(vecCol), m, ksub), targetBucket)

  /** 1-row relation (dim, rotation, m, ksub, centroids) — persistence
    * half of the build-once/serve-many contract ([[PqModel.toDF]]
    * precedent; doubles round-trip parquet bit-exactly).
    */
  def toDF(model: OpqModel, spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    Seq((model.dim, model.rotation.toSeq, model.pq.m, model.pq.ksub,
      model.pq.centroids.toSeq))
      .toDF("dim", "rotation", "m", "ksub", "centroids")
  }

  def fromDF(df: DataFrame): OpqModel = {
    val r = df.select(col("dim"), col("rotation"), col("m"), col("ksub"),
      col("centroids")).collect()(0)
    val dim = r.getInt(0)
    OpqModel(r.getSeq[Double](1).toArray, dim,
      PqModel(r.getInt(2), r.getInt(3), dim, r.getSeq[Double](4).toArray))
  }
}

object OpqImpl {
  def matvec(mat: Array[Double], v: Array[Double]): Array[Double] = {
    val dim = v.length
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      var acc = 0.0
      val off = i * dim
      var j = 0
      while (j < dim) { acc += mat(off + j) * v(j); j += 1 }
      out(i) = acc
      i += 1
    }
    out
  }

  def matvecF(mat: Array[Double], v: ArrayData): ArrayData =
    matvecAd(mat, v, isFloat = true)
  def matvecD(mat: Array[Double], v: ArrayData): ArrayData =
    matvecAd(mat, v, isFloat = false)

  private def matvecAd(mat: Array[Double], v: ArrayData, isFloat: Boolean): ArrayData = {
    val dim = v.numElements()
    val arr = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      arr(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    new GenericArrayData(matvec(mat, arr))
  }
}

/** Dense row-major square-matrix × vector — array<double>(dim).
  * Codegen'd; the matrix rides into generated code as a plan
  * reference (the [[PqEncodeExpr]] pattern).
  */
case class MatVecExpr(child: Expression, mat: Array[Double], dim: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"mat_vec requires array<float|double>, got $t")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    if (isFloat) OpqImpl.matvecF(mat, input.asInstanceOf[ArrayData])
    else OpqImpl.matvecD(mat, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matVec", mat, "double[]")
    val fn = if (isFloat) "matvecF" else "matvecD"
    defineCodeGen(ctx, ev, c => s"graft.functions.OpqImpl.$fn($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecExpr =
    copy(child = newChild)
}
