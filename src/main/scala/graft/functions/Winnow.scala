package graft.functions

import org.apache.spark.sql.{Column, GraftExpr}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken:
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD'03 — the MOSS algorithm): Rabin-Karp rolling hashes over
  * character k-grams, a sliding window of `w` consecutive hashes, and
  * the distinct window minima as the document's fingerprint set.
  *
  * Guarantees (from the paper): any shared substring of length
  * ≥ k + w − 1 produces at least one shared fingerprint, and the
  * fingerprint density is ~2/(w+1) of the k-gram count — a bounded,
  * content-addressed signature that scales an inverted near-dup index
  * by ~w× versus indexing every shingle.
  *
  * One fused codegen'd pass per row: O(n) rolling hash + O(n)
  * monotonic-deque sliding minimum. Hash order is UNSIGNED 64-bit so
  * the DuckDB oracle's UBIGINT MIN agrees bit-for-bit; the emitted
  * values are the raw 64-bit patterns as signed longs.
  *
  * Unit of hashing is the UTF-16 code unit (`charAt`), while the
  * DuckDB oracle hashes codepoints (`unicode(text[j])`) — the
  * bit-for-bit parity claim therefore holds for BMP text (all gate
  * corpora are ASCII); a supplementary-plane character is two code
  * units here vs one codepoint there. Within this engine the
  * fingerprints are self-consistent for any input — near-dup pairing
  * over non-BMP corpora is unaffected, only cross-engine hash parity
  * narrows. (Same caveat applies to the TokenScan tokenizers.)
  */
case class WinnowExpr(child: Expression, k: Int, w: Int) extends TextScanExpr {
  require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    WinnowImpl.winnow(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowImpl.winnow($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowExpr = copy(child = c)
}

object WinnowImpl {
  /** Rolling-hash base; small enough that h·B fits a 128-bit
    * intermediate in the DuckDB oracle's HUGEINT rendering.
    */
  final val Base = 257L

  def winnow(s: UTF8String, k: Int, w: Int): GenericArrayData = {
    val str = s.toString
    val n = str.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val m = n - k + 1
    val hashes = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < k) { h = h * Base + str.charAt(i); i += 1 }
    hashes(0) = h
    var bk = 1L
    i = 0
    while (i < k - 1) { bk *= Base; i += 1 } // Base^(k-1) mod 2^64
    i = 1
    while (i < m) {
      h = (h - str.charAt(i - 1) * bk) * Base + str.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    val sel = new java.util.TreeSet[java.lang.Long]()
    if (m <= w) {
      // fewer grams than a window: the whole doc is one window
      var min = hashes(0)
      i = 1
      while (i < m) {
        if (java.lang.Long.compareUnsigned(hashes(i), min) < 0) min = hashes(i)
        i += 1
      }
      sel.add(min)
    } else {
      // monotonic deque of indices, increasing by unsigned hash value
      val deque = new Array[Int](m)
      var head = 0
      var tail = 0 // [head, tail)
      i = 0
      while (i < m) {
        while (tail > head &&
            java.lang.Long.compareUnsigned(hashes(deque(tail - 1)), hashes(i)) >= 0)
          tail -= 1
        deque(tail) = i
        tail += 1
        if (deque(head) <= i - w) head += 1
        if (i >= w - 1) sel.add(hashes(deque(head)))
        i += 1
      }
    }
    val out = new Array[Any](sel.size)
    val it = sel.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }
}

object Winnow {
  /** Distinct winnowing fingerprints of `text` as array<long> (sorted
    * by signed value — exploded uses are order-insensitive).
    */
  def winnow(text: Column, k: Int, w: Int): Column =
    GraftExpr.column(WinnowExpr(GraftExpr.expression(text), k, w))
}
