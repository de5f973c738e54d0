package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
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
          val out = evs.toSeq.sortBy(_.tsMs).map { ev =>
            val (next, upd) = step(st, ev)
            st = next
            upd
          }
          gs.update(st)
          out.iterator
        })
  }
}
