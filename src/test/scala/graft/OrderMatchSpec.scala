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
