package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Price-time-priority limit-order matching.
  *
  * Reference: order_book.py:206 EventDrivenSimulator (submit → match loop,
  * _match_orders :427). Matching is inherently sequential per symbol, so
  * the Spark shape is a secondary-sort scan (SortedScan.perKey): the
  * shuffle sorts each symbol's flow by (ts, event_id), state lives inside
  * one task per symbol, symbols parallelize across the cluster, and both
  * input and output stream — only the resting book is held in memory.
  * Output is deterministic given the (ts, event_id) total order.
  */
object OrderMatch {

  case class LimitOrder(symbol: String, ts: Long, event_id: Long, side: String,
                        price: Double, qty: Double)
  case class Fill(symbol: String, seq: Long, buy_event_id: Long, sell_event_id: Long,
                  price: Double, qty: Double)

  /** Match one symbol's order flow (price-time priority; trades print at
    * the resting order's price). Input MUST already be sorted by
    * (ts, event_id); fills are emitted lazily per incoming order.
    */
  def matchSymbol(symbol: String, orders: Iterator[LimitOrder]): Iterator[Fill] = {
    // buy book: best = highest price, then earliest; sell book: lowest price, then earliest
    implicit val buyOrd: Ordering[LimitOrder] =
      Ordering.by((o: LimitOrder) => (o.price, -o.ts, -o.event_id))
    val buys = mutable.PriorityQueue.empty[LimitOrder]
    val sells = mutable.PriorityQueue.empty[LimitOrder](
      Ordering.by((o: LimitOrder) => (-o.price, -o.ts, -o.event_id)))
    var seq = 0L

    orders.flatMap { o =>
      val fills = mutable.ArrayBuffer.empty[Fill] // bounded by one order's sweep
      var remaining = o.qty
      if (o.side == "buy") {
        while (remaining > 0 && sells.nonEmpty && sells.head.price <= o.price) {
          val resting = sells.dequeue()
          val traded = math.min(remaining, resting.qty)
          seq += 1
          fills += Fill(symbol, seq, o.event_id, resting.event_id, resting.price, traded)
          remaining -= traded
          if (resting.qty > traded) sells.enqueue(resting.copy(qty = resting.qty - traded))
        }
        if (remaining > 0) buys.enqueue(o.copy(qty = remaining))
      } else {
        while (remaining > 0 && buys.nonEmpty && buys.head.price >= o.price) {
          val resting = buys.dequeue()
          val traded = math.min(remaining, resting.qty)
          seq += 1
          fills += Fill(symbol, seq, resting.event_id, o.event_id, resting.price, traded)
          remaining -= traded
          if (resting.qty > traded) buys.enqueue(resting.copy(qty = resting.qty - traded))
        }
        if (remaining > 0) sells.enqueue(o.copy(qty = remaining))
      }
      fills
    }
  }

  def run(orders: Dataset[LimitOrder]): Dataset[Fill] = {
    val spark = orders.sparkSession
    import spark.implicits._
    SortedScan.perKey(orders, Seq("symbol"), Seq("ts", "event_id"))(_.symbol)(matchSymbol)
  }

  /** The tick feed as synthetic limit orders (side by user parity). */
  def ordersFromTicks(ticks: DataFrame): Dataset[LimitOrder] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks.select(
      col("symbol"),
      col("ts"),
      col("event_id"),
      when(col("user_id") % 2 === 0, "buy").otherwise("sell").as("side"),
      col("price"),
      col("volume").as("qty")).as[LimitOrder]
  }
}
