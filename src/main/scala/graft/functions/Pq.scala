package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftExpr}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization (Jégou, Douze, Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI'11) — the memory-compression
  * tier the ANN family needs at corpus scale. A 64-dim float vector is
  * 256 bytes; its PQ code is `m` bytes (32× smaller at m=8). The
  * corpus side of every candidate join then shuffles/caches codes, not
  * vectors — at 10⁹ vectors that is the difference between an 8 GB and
  * a 256 GB corpus relation — and scoring a candidate is `m` table
  * lookups + adds (ADC: asymmetric distance computation) instead of
  * `dim` multiplies.
  *
  * Split the dimension into `m` subspaces of `dim/m` coordinates; each
  * subspace gets its own `ksub`-centroid codebook; a vector's code is
  * the per-subspace argmin centroid index (one byte per subspace for
  * ksub ≤ 256). A query is NOT quantized: it precomputes a lookup
  * table `lut[s][c] = dot(q_sub_s, codebook[s][c])` once (m·ksub
  * doubles), and the approximate inner product against any code is
  * `Σ_s lut[s][code[s]]`. Metric is inner product — pass L2-normalized
  * vectors for cosine semantics.
  *
  * The reference has no ANN operator at all; within this engine's ANN
  * family (sign/hyperplane LSH, IVF) PQ is the orthogonal axis:
  * LSH/IVF shrink the CANDIDATE SET, PQ shrinks the BYTES AND FLOPS
  * PER CANDIDATE. [[Similarity.pqTopK]] composes them — any bucket
  * expression (sign bucket, IVF cell) on the outside, ADC scoring
  * inside the bucket.
  */
final case class PqModel(m: Int, ksub: Int, dim: Int, centroids: Array[Double])
    extends Serializable {
  require(m > 0 && dim > 0 && dim % m == 0, s"dim $dim must be a positive multiple of m $m")
  require(ksub > 0 && ksub <= 256, s"ksub must be in [1, 256] (codes are one byte), got $ksub")
  require(centroids.length == m * ksub * (dim / m),
    s"centroids length ${centroids.length} != m*ksub*subdim ${m * ksub * (dim / m)}")
  def subdim: Int = dim / m
  /** Flat layout: centroid(s, c)(d) at ((s·ksub + c)·subdim) + d. */
  def centroid(s: Int, c: Int, d: Int): Double = centroids(((s * ksub) + c) * subdim + d)
}

object PqModel {

  /** Data-independent codebook: centroid(s, c, d) drawn uniform(−1, 1)
    * from `splitmix64(seed ⊕ (s·ksub + c)·subdim + d)`'s top 53 bits —
    * a pure function of the parameters, so encode/ADC are exactly
    * renderable in the DuckDB oracle (the gate pins the whole PQ
    * machinery bit-for-bit; recall quality comes from [[train]]).
    */
  def fixed(dim: Int, m: Int, ksub: Int, seed: Long = 0L): PqModel = {
    val subdim = dim / m
    val cs = Array.tabulate(m * ksub * subdim) { i =>
      uniform(SamplingImpl.splitmix64(seed ^ i.toLong))
    }
    PqModel(m, ksub, dim, cs)
  }

  /** Top-53-bits uniform in [−1, 1): (h >>> 11) · 2⁻⁵² − 1, every
    * intermediate exactly representable (53-bit integer → double).
    */
  private[functions] def uniform(h: Long): Double =
    (h >>> 11).toDouble * math.pow(2, -52) - 1.0

  /** Per-subspace Lloyd k-means over a deterministic sample — the
    * model-fitting step. The sample is the `sampleN` vectors with the
    * lowest `splitmix64(id ⊕ seed)` (a distributed top-k, no full
    * sort, membership stable under repartitioning/retries like
    * [[Sampling.hashSample]]), collected to the driver: training data
    * is bounded by `sampleN·dim` doubles (default 16k × 64 = 8 MB) and
    * the model by `m·ksub·subdim = dim·ksub` doubles regardless of
    * corpus size — this collect is a bounded model fit, not a data
    * collect. Seeds are the first `ksub` sampled subvectors; an
    * emptied cluster keeps its previous centroid.
    */
  def train(df: DataFrame, idCol: Column, vecCol: Column, m: Int, ksub: Int,
      iterations: Int = 4, sampleN: Int = 16384, seed: Long = 0L): PqModel =
    trainFromSample(sampleVectors(df, idCol, vecCol, sampleN, seed),
      m, ksub, iterations)

  /** The bounded deterministic sample [[train]] fits on: the `sampleN`
    * vectors with the lowest `splitmix64(id ⊕ seed)` (distributed
    * top-k, retry/partition-stable membership).
    */
  private[functions] def sampleVectors(df: DataFrame, idCol: Column,
      vecCol: Column, sampleN: Int, seed: Long): Array[Array[Double]] =
    df.select(vecCol.cast(ArrayType(DoubleType)).as("v"),
        Sampling.splitmix64(lit(seed).bitwiseXOR(idCol)).as("k"))
      .orderBy(col("k")).limit(sampleN)
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)

  /** Per-subspace Lloyd over an in-memory sample — shared by [[train]]
    * and the OPQ trainer (which rotates the same sample first).
    */
  private[functions] def trainFromSample(sample: Array[Array[Double]],
      m: Int, ksub: Int, iterations: Int): PqModel = {
    require(sample.nonEmpty, "pq train: empty input")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must be a multiple of m $m")
    val subdim = dim / m
    val cs = new Array[Double](m * ksub * subdim)
    var s = 0
    while (s < m) {
      val off = s * subdim
      // seed centroids: the first ksub sampled subvectors (cycled if
      // the sample is smaller than ksub)
      val cent = Array.tabulate(ksub, subdim)((c, d) => sample(c % sample.length)(off + d))
      var it = 0
      while (it < iterations) {
        val sums = Array.ofDim[Double](ksub, subdim)
        val counts = new Array[Int](ksub)
        sample.foreach { v =>
          val c = nearestSub(v, off, subdim, cent)
          counts(c) += 1
          var d = 0
          while (d < subdim) { sums(c)(d) += v(off + d); d += 1 }
        }
        var c = 0
        while (c < ksub) {
          if (counts(c) > 0) {
            var d = 0
            while (d < subdim) { cent(c)(d) = sums(c)(d) / counts(c); d += 1 }
          }
          c += 1
        }
        it += 1
      }
      var c = 0
      while (c < ksub) {
        System.arraycopy(cent(c), 0, cs, ((s * ksub) + c) * subdim, subdim)
        c += 1
      }
      s += 1
    }
    PqModel(m, ksub, dim, cs)
  }

  /** Render the model as a 1-row relation (m, ksub, dim, centroids) —
    * the persistence half of the build-once/serve-many contract for
    * the compressed tiers: a trained codebook writes to parquet next
    * to its code relations and later jobs decode candidates WITHOUT
    * retraining (retraining would silently invalidate every stored
    * code). Doubles round-trip parquet bit-exactly, so served ADC
    * scores are bit-identical to the building job's (spec-pinned).
    */
  def toDF(model: PqModel, spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    Seq((model.m, model.ksub, model.dim, model.centroids.toSeq))
      .toDF("m", "ksub", "dim", "centroids")
  }

  /** Read a model back from [[toDF]]'s layout (1 collected row — a
    * model fit, dim·ksub doubles regardless of corpus size).
    */
  def fromDF(df: DataFrame): PqModel = {
    val r = df.select(col("m").cast("int"), col("ksub").cast("int"),
      col("dim").cast("int"), col("centroids").cast(ArrayType(DoubleType))).head()
    PqModel(r.getInt(0), r.getInt(1), r.getInt(2), r.getSeq[Double](3).toArray)
  }

  private def nearestSub(v: Array[Double], off: Int, subdim: Int,
      cent: Array[Array[Double]]): Int = {
    var best = 0; var bestDist = Double.MaxValue
    var c = 0
    while (c < cent.length) {
      var dist = 0.0; var d = 0
      while (d < subdim) { val t = v(off + d) - cent(c)(d); dist += t * t; d += 1 }
      if (dist < bestDist) { bestDist = dist; best = c }
      c += 1
    }
    best
  }
}

/** Shared eval kernels (also the codegen call targets). */
object PqImpl {

  /** Per-subspace argmin centroid (squared L2, left-to-right fold, ties
    * to the lowest code) — one byte per subspace.
    */
  def encodeF(model: PqModel, v: ArrayData): Array[Byte] = encode(model, v, isFloat = true)
  def encodeD(model: PqModel, v: ArrayData): Array[Byte] = encode(model, v, isFloat = false)

  /** Bulk-extract the vector to a primitive double[] once per row.
    * The per-element `ArrayData.getFloat/getDouble` form made the hot
    * loops megamorphic (UnsafeArrayData from shuffled rows,
    * ColumnarArray from cached relations, GenericArrayData
    * interpreted) — measured as nondeterministic 30–90 s
    * deopt/interpretation bursts on 16k-op-per-row encode stages in
    * long-lived JVMs (SCALE.md round 8). One virtual bulk copy per
    * row keeps the O(dim·ksub) loop monomorphic on primitives.
    */
  private def toDoubles(v: ArrayData, isFloat: Boolean): Array[Double] =
    if (isFloat) {
      val f = v.toFloatArray()
      val a = new Array[Double](f.length)
      var i = 0
      while (i < f.length) { a(i) = f(i).toDouble; i += 1 }
      a
    } else v.toDoubleArray()

  private def encode(model: PqModel, v: ArrayData, isFloat: Boolean): Array[Byte] = {
    val m = model.m; val ksub = model.ksub; val subdim = model.subdim
    val x = toDoubles(v, isFloat)
    val cs = model.centroids
    val out = new Array[Byte](m)
    var s = 0; var off = 0 // off tracks ((s·ksub)+c)·subdim
    while (s < m) {
      val base = s * subdim
      var best = 0; var bestDist = Double.MaxValue
      var c = 0
      while (c < ksub) {
        var dist = 0.0; var d = 0
        while (d < subdim) {
          val t = x(base + d) - cs(off + d)
          dist += t * t
          d += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1; off += subdim
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  /** The query-side ADC table: lut[s·ksub + c] = dot(q_sub_s,
    * codebook[s][c]) — m·ksub doubles computed once per query row.
    */
  def lutF(model: PqModel, q: ArrayData): ArrayData = lut(model, q, isFloat = true)
  def lutD(model: PqModel, q: ArrayData): ArrayData = lut(model, q, isFloat = false)

  private def lut(model: PqModel, q: ArrayData, isFloat: Boolean): ArrayData = {
    val m = model.m; val ksub = model.ksub; val subdim = model.subdim
    val x = toDoubles(q, isFloat)
    val cs = model.centroids
    val out = new Array[Double](m * ksub)
    var s = 0; var off = 0
    while (s < m) {
      val base = s * subdim
      var c = 0
      while (c < ksub) {
        var dot = 0.0; var d = 0
        while (d < subdim) {
          dot += x(base + d) * cs(off + d)
          d += 1
        }
        out(s * ksub + c) = dot
        c += 1; off += subdim
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Approximate inner product of the LUT's query against a code:
    * m lookups + adds — no vector touched.
    */
  def adc(lut: ArrayData, codes: Array[Byte], ksub: Int): Double = {
    var acc = 0.0; var s = 0
    while (s < codes.length) { acc += lut.getDouble(s * ksub + (codes(s) & 0xff)); s += 1 }
    acc
  }

  /** Direct ADC: dot the raw query against the code's selected
    * centroids, per-subspace partial sums added in subspace order —
    * bit-identical to lut+[[adc]] (same fold shape), but with no LUT
    * column in the plan. This is the form the relational join path
    * uses: an m·ksub-double LUT per query row is 16 KB at ksub=256,
    * and Spark's row shuffle COPIES it once per joined candidate
    * (measured 29× slower than full-precision cosine at sf1); the
    * LUT expression is for genuinely-amortized scans (mapPartitions
    * serving over a cached code block).
    */
  def adcDirectF(model: PqModel, q: ArrayData, codes: Array[Byte]): Double =
    adcDirect(model, q, codes, isFloat = true)
  def adcDirectD(model: PqModel, q: ArrayData, codes: Array[Byte]): Double =
    adcDirect(model, q, codes, isFloat = false)

  private def adcDirect(model: PqModel, q: ArrayData, codes: Array[Byte],
      isFloat: Boolean): Double = {
    val ksub = model.ksub; val subdim = model.subdim
    val x = toDoubles(q, isFloat)
    val cs = model.centroids
    var acc = 0.0; var s = 0
    while (s < codes.length) {
      val off = ((s * ksub) + (codes(s) & 0xff)) * subdim
      val base = s * subdim
      var dot = 0.0; var d = 0
      while (d < subdim) {
        dot += x(base + d) * cs(off + d)
        d += 1
      }
      acc += dot
      s += 1
    }
    acc
  }
}

/** PQ code of a vector — binary(m). Codegen'd; the model rides into
  * the generated code as a plan reference object.
  */
case class PqEncodeExpr(child: Expression, model: PqModel) extends UnaryExpression {
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_encode requires array<float|double>, got $t")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    if (isFloat) PqImpl.encodeF(model, input.asInstanceOf[ArrayData])
    else PqImpl.encodeD(model, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqModel", model, classOf[PqModel].getName)
    val fn = if (isFloat) "encodeF" else "encodeD"
    defineCodeGen(ctx, ev, c => s"graft.functions.PqImpl.$fn($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** Query-side ADC lookup table — array<double> of m·ksub entries. */
case class PqLutExpr(child: Expression, model: PqModel) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_lut requires array<float|double>, got $t")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    if (isFloat) PqImpl.lutF(model, input.asInstanceOf[ArrayData])
    else PqImpl.lutD(model, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqModel", model, classOf[PqModel].getName)
    val fn = if (isFloat) "lutF" else "lutD"
    defineCodeGen(ctx, ev, c => s"graft.functions.PqImpl.$fn($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}

/** ADC score: sum of the LUT entries the code selects. */
case class AdcDotExpr(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"adc_dot requires (array<double> lut, binary codes), got ($l, $r)")
  }

  override def nullSafeEval(lut: Any, codes: Any): Any =
    PqImpl.adc(lut.asInstanceOf[ArrayData], codes.asInstanceOf[Array[Byte]], ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.functions.PqImpl.adc($l, $r, $ksub)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AdcDotExpr = copy(left = newLeft, right = newRight)
}

/** Direct ADC score of a raw query vector against a PQ code — see
  * [[PqImpl.adcDirectF]] for why the join path prefers this over a
  * materialized LUT column.
  */
case class AdcScoreExpr(left: Expression, right: Expression, model: PqModel)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _) | ArrayType(DoubleType, _), BinaryType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"adc_score requires (array<float|double> query, binary codes), got ($l, $r)")
  }

  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override def nullSafeEval(q: Any, codes: Any): Any =
    if (isFloat) PqImpl.adcDirectF(model, q.asInstanceOf[ArrayData], codes.asInstanceOf[Array[Byte]])
    else PqImpl.adcDirectD(model, q.asInstanceOf[ArrayData], codes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqModel", model, classOf[PqModel].getName)
    val fn = if (isFloat) "adcDirectF" else "adcDirectD"
    defineCodeGen(ctx, ev, (l, r) => s"graft.functions.PqImpl.$fn($ref, $l, $r)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AdcScoreExpr = copy(left = newLeft, right = newRight)
}

object Pq {
  def pq_encode(vec: Column, model: PqModel): Column =
    GraftExpr.column(PqEncodeExpr(GraftExpr.expression(vec), model))

  def adc_score(vec: Column, codes: Column, model: PqModel): Column =
    GraftExpr.column(AdcScoreExpr(GraftExpr.expression(vec),
      GraftExpr.expression(codes), model))

  def pq_lut(vec: Column, model: PqModel): Column =
    GraftExpr.column(PqLutExpr(GraftExpr.expression(vec), model))

  def adc_dot(lut: Column, codes: Column, ksub: Int): Column =
    GraftExpr.column(AdcDotExpr(GraftExpr.expression(lut), GraftExpr.expression(codes), ksub))
}
