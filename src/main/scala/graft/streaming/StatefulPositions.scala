package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-driven position/equity tracking as streaming state.
  *
  * Reference: backtesting/engine.py EventDrivenEngine.run (:160-230) and
  * paper_trading.py PaperBroker — a sequential per-symbol loop over
  * signal events updating position/cash/equity. Spark-native shape:
  * `flatMapGroupsWithState` keyed by symbol — state is O(1) per symbol,
  * events stream through in event order within each micro-batch, and the
  * operator scales horizontally across symbols (exactly how a matching/
  * accounting loop shards on a cluster).
  */
object StatefulPositions {

  case class SignalEvent(symbol: String, tsMs: Long, price: Double, signal: Int)
  case class PositionState(position: Double, cash: Double, lastPrice: Double)
  case class PositionUpdate(symbol: String, tsMs: Long, position: Double,
                            cash: Double, equity: Double, traded: Double)

  val InitialCash = 1000000.0
  val CostRate = 0.0015
  val Shares = 100.0

  /** Pure per-event transition (unit-testable without a stream). */
  def step(state: PositionState, ev: SignalEvent): (PositionState, PositionUpdate) = {
    val desired = ev.signal.toDouble
    val trade = (desired - state.position) * Shares
    val cost = math.abs(trade) * ev.price * CostRate
    val cash = state.cash - trade * ev.price - cost
    val next = PositionState(desired, cash, ev.price)
    val equity = cash + desired * Shares * ev.price
    (next, PositionUpdate(ev.symbol, ev.tsMs, desired, cash, equity, trade))
  }

  def track(events: Dataset[SignalEvent]): Dataset[PositionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (symbol: String, evs: Iterator[SignalEvent], gs: GroupState[PositionState]) => {
          var st = gs.getOption.getOrElse(PositionState(0.0, InitialCash, 0.0))
          // in-batch sort is bounded by the trigger interval's event count
          // (unlike a batch groupByKey, which would buffer all history)
          val out = evs.toSeq.sortBy(_.tsMs).map { ev =>
            val (next, upd) = step(st, ev)
            st = next
            upd
          }
          gs.update(st)
          out.iterator
        })
  }

  /** Account-level roll-up over the position-update stream
    * (paper_trading.py:214 get_account_summary): latest state per symbol
    * → one account row with cash, position value, portfolio value, PnL
    * and return. Runs on the tracked sink table (or any batch of
    * updates); each symbol's ledger started from InitialCash.
    */
  def accountSummary(updates: DataFrame): DataFrame =
    updates.groupBy("symbol")
      .agg(max_by(struct(col("cash"), col("equity")), col("tsMs")).as("last"))
      .select(col("symbol"), col("last.cash").as("cash"), col("last.equity").as("equity"))
      .agg(count(lit(1)).as("n_symbols"),
        sum(col("cash")).as("cash"),
        sum(col("equity") - col("cash")).as("position_value"),
        sum(col("equity")).as("portfolio_value"))
      .withColumn("pnl", col("portfolio_value") - col("n_symbols") * InitialCash)
      .withColumn("return_pct",
        (col("portfolio_value") / (col("n_symbols") * InitialCash) - 1) * 100)
}
