package graft.examples

import org.apache.spark.sql._
import org.apache.spark.sql.functions.col
import graft.operators.StatefulOps

/** Port of the reference's orderbook example (examples/orderbook.py):
  * maintain a level-2 book per product from a stream of deltas and emit
  * the top-of-book summary after each update. The reference feeds a
  * websocket; here deltas arrive as rows (product, seq, side, price,
  * size) — size 0 removes a level, matching the reference's
  * `OrderBookState.update`.
  */
object OrderBook {

  final case class Summary(product: String, seq: Long,
      bidPrice: Double, bidSize: Double, askPrice: Double, askSize: Double, spread: Double)

  private final class BookState {
    val bids = scala.collection.mutable.TreeMap.empty[Double, Double]
    val asks = scala.collection.mutable.TreeMap.empty[Double, Double]
    def update(side: String, price: Double, size: Double): Unit = {
      val book = if (side == "buy") bids else asks
      if (size == 0.0) book.remove(price) else book.update(price, size)
    }
    def summary(product: String, seq: Long): Summary = {
      val (bp, bs) = bids.lastOption.getOrElse((Double.NaN, 0.0))
      val (ap, as_) = asks.headOption.getOrElse((Double.NaN, 0.0))
      Summary(product, seq, bp, bs, ap, as_, ap - bp)
    }
  }

  /** deltas: DataFrame(product string, seq long, side string, price double, size double). */
  def topOfBook(deltas: DataFrame): Dataset[Summary] = {
    import deltas.sparkSession.implicits._
    StatefulOps.statefulMap[BookState, Summary](
      deltas, "product", Seq(col("seq")),
      init = _ => new BookState) { (book, row) =>
      book.update(row.getString(row.fieldIndex("side")),
        row.getDouble(row.fieldIndex("price")),
        row.getDouble(row.fieldIndex("size")))
      (book, book.summary(row.getString(row.fieldIndex("product")),
        row.getLong(row.fieldIndex("seq"))))
    }
  }
}
