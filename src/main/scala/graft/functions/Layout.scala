package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftExpr}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, IntegralDivide, Literal, Multiply, Subtract, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton-curve) data layout — multi-dimensional clustering
  * for parquet min/max data skipping, the write-side half of "make the
  * 100 TB scan cheap". A single-column sort gives perfect pruning on
  * that column and none on the others; interleaving the bits of
  * several bucketized columns gives every interleaved column locality
  * within each file, so a scan filtered on ANY subset of them prunes
  * most files by footer stats alone (Delta/Iceberg OPTIMIZE ZORDER is
  * this operation). LayoutSpec measures it end-to-end: the same
  * selective 2-dim filter reads a fraction of the z-ordered files vs
  * a time-sorted layout of identical row content.
  *
  * Pieces:
  *  - [[Layout.bucketize]]: integer min/max scaling of a Long column
  *    into 2^bits buckets (clamped; pure integer arithmetic — the
  *    `q_zorder` gate renders it and the interleave bit-exactly in
  *    DuckDB);
  *  - [[ZValueExpr]]: codegen'd round-robin bit interleave of the
  *    bucket array (col c's bit i lands at position i·ncols + c);
  *  - [[Layout.zorderBy]]: range-repartition + in-partition sort on
  *    the z-value — one range exchange, the same cost as the
  *    single-column sort it replaces, then write.
  *
  * Sizing: ncols·bits <= 62. More bits = finer curve resolution;
  * 10-16 bits/col saturates typical file counts (pruning granularity
  * is files, not rows).
  */
object Layout {

  /** Scale a Long column into [0, 2^bits) by the given (inclusive)
    * domain bounds, clamping out-of-domain values to the edge buckets.
    * Integer-exact: bucket = (v - min) · 2^bits div (max - min + 1).
    */
  def bucketize(c: Column, min: Long, max: Long, bits: Int): Column = {
    require(max > min, s"empty domain [$min,$max]")
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val m = 1L << bits
    val span = max - min + 1
    val clamped = least(greatest(c.cast("long"), lit(min)), lit(max))
    // exact integer arithmetic (SQL `div`), NOT double division — at
    // epoch-micros spans a double quotient can round up across an
    // integer boundary and shift the bucket
    GraftExpr.column(IntegralDivide(
      Multiply(Subtract(GraftExpr.expression(clamped), Literal(min)), Literal(m)),
      Literal(span)))
  }

  /** Morton z-value of pre-bucketized Long columns (round-robin bit
    * interleave). All buckets must be in [0, 2^bits).
    */
  def zvalue(bits: Int, buckets: Column*): Column = {
    require(buckets.nonEmpty && buckets.size * bits <= 62,
      s"ncols*bits must be <= 62, got ${buckets.size} * $bits")
    GraftExpr.column(ZValueExpr(
      GraftExpr.expression(array(buckets: _*)), bits))
  }

  /** Cluster `df` on the z-order of the given (column, domainMin,
    * domainMax) dims and return it ready to write: one range exchange
    * into `numFiles` output partitions + in-partition sort, so each
    * written file covers a compact z-range (= a small hyper-rectangle
    * of the dim space) and its parquet footer min/max prune reads on
    * any filtered subset of the dims.
    */
  def zorderBy(df: DataFrame, numFiles: Int, bits: Int,
      dims: (Column, Long, Long)*): DataFrame = {
    val z = zvalue(bits, dims.map { case (c, lo, hi) => bucketize(c, lo, hi, bits) }: _*)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** The join-side half of "make the 100 TB scan cheap" (z-order is the
    * filter-side half): persist `df` as a BUCKETED, bucket-sorted
    * external parquet table, so every later equi-join or aggregation on
    * the bucket key plans WITHOUT an exchange — Spark's hash-bucket
    * metadata proves both sides co-partitioned, and the per-bucket
    * sort feeds SortMergeJoin without a sort node either. Paying the
    * shuffle ONCE at layout time instead of per-join is the standard
    * warehouse contract for fact tables joined daily (LayoutSpec
    * asserts the exchange-free, sort-free plan and row parity against
    * the unbucketed join).
    *
    * Same-numBuckets tables only (Spark joins bucketed tables
    * shuffle-free when bucket counts match; a mismatch re-shuffles the
    * smaller side). Requires a catalog (`saveAsTable`) — bucketing
    * metadata lives there, not in parquet footers. Exchange
    * elimination is unconditional; SORT elimination additionally
    * needs `spark.sql.legacy.bucketedTableScan.outputOrdering=true`
    * (off by default since SPARK-28595 because it presumes one file
    * per bucket — exactly what the repartition below guarantees).
    */
  def bucketWrite(df: DataFrame, table: String, path: String,
      numBuckets: Int, key: String, extraSortCols: String*): Unit =
    // repartition on the key first so each bucket is ONE file: Spark
    // only trusts sortBy metadata (and so skips the join-side Sort)
    // when a bucket has a single file — multi-file buckets re-sort
    df.repartition(numBuckets, col(key))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, key)
      .sortBy(key, extraSortCols: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Small-file compaction — the routine corpus-maintenance pass a
    * streaming-ingested 100 TB corpus needs: micro-batch sinks write
    * one file per trigger per partition, and a scan later pays a file
    * open + footer read + scheduler task per tiny file (at 10k files
    * per TB-day the metadata overhead dwarfs the data). This rewrites
    * `inDir` into `ceil(totalBytes / targetFileBytes)` files: the
    * target count comes from the EXACT on-disk byte total (listed from
    * the filesystem — compression carries over since it is the same
    * data re-encoded), the rewrite is one `repartition` exchange, and
    * `sortCols` optionally re-establishes an in-file ordering
    * (z-order / term-sorted layouts survive compaction — without it a
    * round-robin repartition destroys min/max pruning).
    *
    * Returns the output file count. `outDir` must differ from `inDir`
    * (a parquet read cannot overwrite its own input); swap is the
    * caller's atomic-rename step, matching [[graft.functions.Dedup]]'s
    * snapshot-maintenance contract.
    */
  def compactDir(spark: org.apache.spark.sql.SparkSession, inDir: String,
      outDir: String, targetFileBytes: Long,
      sortCols: Seq[Column] = Nil): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive, got $targetFileBytes")
    require(new org.apache.hadoop.fs.Path(inDir) !=
      new org.apache.hadoop.fs.Path(outDir), "compactDir: outDir must differ from inDir")
    val p = new org.apache.hadoop.fs.Path(inDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    var total = 0L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) total += f.getLen
    }
    val numFiles = math.max(1L, (total + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(inDir)
    val arranged =
      if (sortCols.isEmpty) df.repartition(numFiles)
      else df.repartition(numFiles).sortWithinPartitions(sortCols: _*)
    arranged.write.mode("overwrite").parquet(outDir)
    numFiles
  }
}

object LayoutImpl {
  def interleave(buckets: ArrayData, bits: Int): Long = {
    val n = buckets.numElements()
    var z = 0L
    var i = 0
    while (i < bits) {
      var c = 0
      while (c < n) {
        z |= ((buckets.getLong(c) >>> i) & 1L) << (i * n + c)
        c += 1
      }
      i += 1
    }
    z
  }
}

/** Round-robin bit interleave of array<long> buckets into one Long. */
case class ZValueExpr(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"zvalue expects array<long>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    LayoutImpl.interleave(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LayoutImpl.interleave($c, $bits)")

  override protected def withNewChildInternal(c: Expression): ZValueExpr =
    copy(child = c)
}
