package graft

import graft.operators.OrderMatch
import graft.operators.OrderMatch.LimitOrder
import org.scalatest.funsuite.AnyFunSuite

class OrderMatchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("price-time priority: best-priced resting order fills first, at its price") {
    val fills = OrderMatch.matchSymbol("A", Iterator(
      LimitOrder("A", 1L, 1L, "sell", 100.0, 10.0),
      LimitOrder("A", 2L, 2L, "sell", 99.0, 5.0),
      LimitOrder("A", 3L, 3L, "buy", 101.0, 12.0)
    )).toSeq
    assert(fills.map(f => (f.sell_event_id, f.price, f.qty)) ==
      Seq((2L, 99.0, 5.0), (1L, 100.0, 7.0)))
  }

  test("time priority breaks price ties; partial fills rest on the book") {
    val fills = OrderMatch.matchSymbol("A", Iterator(
      LimitOrder("A", 1L, 1L, "buy", 100.0, 4.0),
      LimitOrder("A", 2L, 2L, "buy", 100.0, 4.0),
      LimitOrder("A", 3L, 3L, "sell", 100.0, 6.0)
    )).toSeq
    assert(fills.map(f => (f.buy_event_id, f.qty)) == Seq((1L, 4.0), (2L, 2.0)))
  }

  test("lifecycle: market orders fill at next tick with slippage; cancels remove resting orders") {
    import graft.operators.OrderLifecycle
    import graft.operators.OrderLifecycle.BookEvent
    val trades = OrderLifecycle.scanSymbol("A", Iterator(
      BookEvent("A", 1L, 1L, "tick", "buy", 100.0, 0.0, -1L),
      BookEvent("A", 2L, 2L, "limit", "buy", 99.0, 5.0, -1L),
      BookEvent("A", 3L, 3L, "tick", "buy", 100.0, 0.0, -1L),  // 100 > 99: rests
      BookEvent("A", 4L, 4L, "tick", "buy", 98.0, 0.0, -1L),   // crosses: fills at 99
      BookEvent("A", 5L, 5L, "market", "buy", 0.0, 2.0, -1L),
      BookEvent("A", 6L, 6L, "tick", "buy", 100.0, 0.0, -1L),  // market fills at 100*(1+slip)
      BookEvent("A", 7L, 7L, "limit", "sell", 101.0, 3.0, -1L),
      BookEvent("A", 8L, 8L, "tick", "sell", 100.0, 0.0, -1L), // 100 < 101: rests
      BookEvent("A", 9L, 9L, "cancel", "sell", 0.0, 0.0, 7L),
      BookEvent("A", 10L, 10L, "tick", "sell", 102.0, 0.0, -1L) // would cross, but cancelled
    )).toSeq
    assert(trades.map(t => (t.order_event_id, t.fill_kind, t.price, t.qty)) == Seq(
      (2L, "book_cross", 99.0, 5.0),
      (5L, "market", 100.0 * (1 + OrderLifecycle.Slippage), 2.0)))
  }

  test("lifecycle: marketable limit fills at its limit price; short sells are rejected") {
    import graft.operators.OrderLifecycle
    import graft.operators.OrderLifecycle.BookEvent
    val trades = OrderLifecycle.scanSymbol("A", Iterator(
      BookEvent("A", 1L, 1L, "limit", "sell", 90.0, 1.0, -1L),
      BookEvent("A", 2L, 2L, "tick", "sell", 100.0, 0.0, -1L), // marketable but no position
      BookEvent("A", 3L, 3L, "limit", "buy", 101.0, 2.0, -1L),
      BookEvent("A", 4L, 4L, "tick", "buy", 100.0, 0.0, -1L),  // 100 <= 101: fills at 101
      BookEvent("A", 5L, 5L, "limit", "sell", 90.0, 1.0, -1L),
      BookEvent("A", 6L, 6L, "tick", "sell", 100.0, 0.0, -1L)  // now position=2: fills
    )).toSeq
    assert(trades.map(t => (t.order_event_id, t.side, t.fill_kind, t.price)) == Seq(
      (3L, "buy", "limit_immediate", 101.0),
      (5L, "sell", "limit_immediate", 90.0)))
  }

  test("lifecycle distributed run: trades exist, position and cash ledgers never go negative") {
    import graft.operators.OrderLifecycle
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val trades = OrderLifecycle.run(
      OrderLifecycle.eventsFromTicks(Tables.ticks(spark, TestSpark.Sf))).toDF().cache()
    assert(trades.count() > 0)
    assert(trades.filter(col("qty") <= 0).count() == 0)
    // commission is always qty*price*rate
    assert(trades.filter(
      abs(col("commission") - col("qty") * col("price") * OrderLifecycle.Commission) > 1e-9)
      .count() == 0)
    val w = Window.partitionBy("symbol").orderBy("trade_seq")
      .rowsBetween(Window.unboundedPreceding, 0)
    val signedQty = when(col("side") === "buy", col("qty")).otherwise(-col("qty"))
    val cashDelta = when(col("side") === "buy",
      -(col("qty") * col("price") + col("commission")))
      .otherwise(col("qty") * col("price") - col("commission"))
    val ledger = trades
      .withColumn("pos", sum(signedQty).over(w))
      .withColumn("cash", lit(OrderLifecycle.InitialCash) + sum(cashDelta).over(w))
    assert(ledger.filter(col("pos") < -1e-9).count() == 0)
    assert(ledger.filter(col("cash") < -1e-9).count() == 0)
    trades.unpersist()
  }

  test("shared-account lifecycle: distributed replay == single-task replay; one cash pool") {
    import graft.operators.OrderLifecycle
    val events = OrderLifecycle.accountEventsFromTicks(Tables.ticks(spark, TestSpark.Sf))
    def key(t: OrderLifecycle.LifecycleTrade) =
      (t.symbol, t.trade_seq, t.order_event_id, t.side, t.fill_kind, t.qty, t.price, t.ts)
    val dist = OrderLifecycle.runSharedAccount(events).collect().map(key).sortBy(_.toString)
    // ground truth: the same account replayed sequentially in one iterator,
    // global (ts, event_id) order across symbols — the reference's loop
    val seqTruth = OrderLifecycle.scanAccount("primary",
      events.collect().sortBy(e => (e.ts, e.event_id)).iterator)
      .map(key).toArray.sortBy(_.toString)
    assert(dist.nonEmpty)
    assert(dist.toSeq == seqTruth.toSeq)
    // cash coupling is real: one shared pool funds strictly fewer (or
    // equal) buys than five per-symbol accounts of the same size
    val perSymbolBuys = OrderLifecycle.run(
      OrderLifecycle.eventsFromTicks(Tables.ticks(spark, TestSpark.Sf)))
      .collect().count(_.side == "buy")
    assert(dist.count(_._4 == "buy") <= perSymbolBuys)
  }

  test("distributed run: fills are valid and conserved per symbol") {
    import org.apache.spark.sql.functions._
    val orders = OrderMatch.ordersFromTicks(Tables.ticks(spark, TestSpark.Sf))
    val fills = OrderMatch.run(orders).toDF().cache()
    assert(fills.count() > 0)
    assert(fills.filter(col("qty") <= 0).count() == 0)
    assert(fills.filter(col("buy_event_id") === col("sell_event_id")).count() == 0)
    val filled = fills.groupBy("symbol").agg(sum("qty").as("filled"))
    val flow = orders.toDF().groupBy("symbol")
      .agg(sum(when(col("side") === "buy", col("qty")).otherwise(0.0)).as("buy_qty"),
        sum(when(col("side") === "sell", col("qty")).otherwise(0.0)).as("sell_qty"))
    val bad = filled.join(flow, "symbol")
      .filter(col("filled") > least(col("buy_qty"), col("sell_qty"))).count()
    assert(bad == 0)
  }
}
