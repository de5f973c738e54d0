package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Paper-trading loop: simulated live feed → strategy orders → broker
  * execution → account summary.
  *
  * Reference: backtesting/paper_trading.py — PaperBroker._execute_order
  * (:126-190, slippage/commission/limit/reject semantics), LiveDataFeed
  * ._simulated_feed (:263-280, random-walk ticks), PaperTradingEngine
  * (:300-380, feed→strategy→broker wiring + summary). The reference is a
  * single-process asyncio loop; the Spark-native shape is three
  * `flatMapGroupsWithState` operators — feed state keyed by symbol,
  * strategy state keyed by symbol, broker state keyed by account — so
  * each stage is O(1) state per key and shards horizontally, with the
  * single-account sequential execution contract preserved by in-batch
  * (tsMs, orderId) ordering inside the account group (same discipline as
  * OrderLifecycle.runSharedAccount).
  *
  * Feed noise is a deterministic hash of (symbol, seq) — same
  * statistical shape as the reference's `np.random.normal(0, 0.001)`
  * walk, but replayable: a restarted stream regenerates identical
  * prices, which is what makes the loop testable and the state-store
  * recovery exact.
  */
object PaperTrading {

  val DefaultCommission = 0.001
  val DefaultSlippage = 0.0005
  val InitialCash = 100000.0

  // ---------------------------------------------------------------- feed

  case class Beat(symbol: String, seq: Long, tsMs: Long)
  case class Tick(symbol: String, seq: Long, tsMs: Long, price: Double)
  case class FeedState(price: Double)

  private def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  private def unit(h: Long): Double =
    ((h >>> 11) + 1).toDouble / (1L << 53).toDouble // (0,1], ln-safe: log(u) <= 0 always

  /** Deterministic standard normal for (symbol, seq) via Box-Muller. */
  def gaussian(symbol: String, seq: Long): Double = {
    val base = mix64(symbol.hashCode.toLong * 0x100000001b3L + seq)
    val u1 = unit(base)
    val u2 = unit(mix64(base))
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  /** Start-of-walk price, uniform in [50, 200) (paper_trading.py:266). */
  def initialPrice(symbol: String): Double =
    50.0 + 150.0 * unit(mix64(symbol.hashCode.toLong))

  /** 0.1%-vol random-walk step (paper_trading.py:271-275). */
  def nextPrice(prev: Double, symbol: String, seq: Long): Double =
    prev * (1.0 + 0.001 * gaussian(symbol, seq))

  /** Beats → ticks. Price state lives in the state store keyed by
    * symbol, so the walk resumes exactly across micro-batches and
    * restarts.
    */
  def simulatedTicks(beats: Dataset[Beat]): Dataset[Tick] = {
    val spark = beats.sparkSession
    import spark.implicits._
    beats
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (symbol: String, bs: Iterator[Beat], gs: GroupState[FeedState]) => {
          var price = gs.getOption.map(_.price).getOrElse(initialPrice(symbol))
          val out = bs.toSeq.sortBy(_.seq).map { b =>
            price = nextPrice(price, symbol, b.seq)
            Tick(symbol, b.seq, b.tsMs, price)
          }
          gs.update(FeedState(price))
          out.iterator
        })
  }

  /** Production feed: the rate source's monotone (timestamp, value)
    * stream fanned out to one beat per symbol per row. Symbols is a
    * fixed watchlist (reference LiveDataFeed ctor) — the fan-out is a
    * broadcast-size literal array, no shuffle.
    */
  def rateFeed(spark: SparkSession, symbols: Seq[String], rowsPerSecond: Int = 1): Dataset[Beat] = {
    import spark.implicits._
    spark.readStream.format("rate").option("rowsPerSecond", rowsPerSecond.toLong).load()
      .select(explode(typedLit(symbols)).as("symbol"), col("value").as("seq"),
        (col("timestamp").cast("double") * 1000).cast("long").as("tsMs"))
      .as[Beat]
  }

  // -------------------------------------------------------------- broker

  case class OrderEvent(accountId: String, orderId: Long, tsMs: Long, symbol: String,
                        side: String, orderType: String, quantity: Double,
                        limitPrice: Double, marketPrice: Double)
  case class AccountState(cash: Double, positions: Map[String, Double],
                          nOrders: Long, nTrades: Long)
  case class ExecReport(accountId: String, orderId: Long, execSeq: Long, tradeId: Long,
                        tsMs: Long, symbol: String, side: String, status: String,
                        quantity: Double, fillPrice: Double, commission: Double,
                        cash: Double, position: Double)

  /** Pure single-order transition — the PaperBroker._execute_order
    * contract (paper_trading.py:126-190):
    *   - buy executes at market*(1+slippage), sell at market*(1-slippage)
    *   - a limit buy is UNFILLED if the slipped price exceeds the limit,
    *     else fills AT the limit price (sell symmetric)
    *   - commission = quantity * fillPrice * rate
    *   - buy REJECTED if cash < value + commission; sell REJECTED if the
    *     held position is short of the order quantity
    * tradeId == 0 marks a non-fill (reference increments trade_counter
    * only on fills).
    */
  def execStep(st: AccountState, ev: OrderEvent,
               commission: Double = DefaultCommission,
               slippage: Double = DefaultSlippage): (AccountState, ExecReport) = {
    val counted = st.copy(nOrders = st.nOrders + 1)
    val held = st.positions.getOrElse(ev.symbol, 0.0)
    val isBuy = ev.side == "buy"
    val slipped =
      if (isBuy) ev.marketPrice * (1.0 + slippage) else ev.marketPrice * (1.0 - slippage)
    val (fillable, px) =
      if (ev.orderType == "limit") {
        if (isBuy && slipped > ev.limitPrice) (false, ev.limitPrice)
        else if (!isBuy && slipped < ev.limitPrice) (false, ev.limitPrice)
        else (true, ev.limitPrice)
      } else (true, slipped)

    def report(status: String, next: AccountState, fillPx: Double, comm: Double,
               tradeId: Long): (AccountState, ExecReport) =
      (next, ExecReport(ev.accountId, ev.orderId, counted.nOrders, tradeId, ev.tsMs,
        ev.symbol, ev.side, status, ev.quantity, fillPx, comm, next.cash,
        next.positions.getOrElse(ev.symbol, 0.0)))

    if (!fillable) report("UNFILLED", counted, 0.0, 0.0, 0L)
    else {
      val value = ev.quantity * px
      val comm = value * commission
      if (isBuy) {
        if (counted.cash < value + comm) report("REJECTED", counted, 0.0, 0.0, 0L)
        else report("FILLED",
          counted.copy(cash = counted.cash - value - comm,
            positions = counted.positions.updated(ev.symbol, held + ev.quantity),
            nTrades = counted.nTrades + 1),
          px, comm, counted.nTrades + 1)
      } else {
        if (held < ev.quantity) report("REJECTED", counted, 0.0, 0.0, 0L)
        else report("FILLED",
          counted.copy(cash = counted.cash + value - comm,
            positions = counted.positions.updated(ev.symbol, held - ev.quantity),
            nTrades = counted.nTrades + 1),
          px, comm, counted.nTrades + 1)
      }
    }
  }

  /** Order stream → execution reports. One account = one key = one
    * sequential ledger; distinct accounts execute in parallel.
    */
  def broker(orders: Dataset[OrderEvent],
             initialCash: Double = InitialCash,
             commission: Double = DefaultCommission,
             slippage: Double = DefaultSlippage): Dataset[ExecReport] = {
    val spark = orders.sparkSession
    import spark.implicits._
    orders
      .groupByKey(_.accountId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (_: String, evs: Iterator[OrderEvent], gs: GroupState[AccountState]) => {
          var st = gs.getOption.getOrElse(AccountState(initialCash, Map.empty, 0L, 0L))
          // (tsMs, orderId) alone is NOT total across symbols (rateFeed
          // gives every symbol the same seq per beat); symbol breaks the
          // tie so multi-symbol execution order is deterministic
          val out = evs.toSeq.sortBy(e => (e.tsMs, e.orderId, e.symbol)).map { ev =>
            val (next, rep) = execStep(st, ev, commission, slippage)
            st = next
            rep
          }
          gs.update(st)
          out.iterator
        })
  }

  // ------------------------------------------------------------ strategy

  case class StratState(ref: Double, holding: Double)

  /** Band-crossing momentum orders off the tick stream (the engine's
    * `generate_orders` hook, paper_trading.py:340-352): enter long when
    * the price breaks `band` above the reference price, exit when it
    * breaks `band` below. Reference price rebases on each action, so the
    * strategy emits alternating buy/sell market orders. orderId is the
    * tick seq (unique per symbol stream).
    *
    * OPEN-LOOP: this stage shards per symbol and cannot see broker
    * outcomes, so it assumes every order fills — size `qty` so a fill
    * can never be cash-rejected (qty * maxPrice * nSymbols well under
    * the account's cash), or use [[engineLoop]], which closes the loop.
    */
  def momentumOrders(ticks: Dataset[Tick], accountId: String, qty: Double,
                     band: Double = 0.001): Dataset[OrderEvent] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (symbol: String, ts: Iterator[Tick], gs: GroupState[StratState]) => {
          var st = gs.getOption.getOrElse(StratState(Double.NaN, 0.0))
          val out = ts.toSeq.sortBy(_.seq).flatMap { t =>
            if (st.ref.isNaN) { st = StratState(t.price, st.holding); None }
            else if (st.holding == 0.0 && t.price > st.ref * (1.0 + band)) {
              st = StratState(t.price, qty)
              Some(OrderEvent(accountId, t.seq, t.tsMs, symbol, "buy", "market",
                qty, 0.0, t.price))
            } else if (st.holding > 0.0 && t.price < st.ref * (1.0 - band)) {
              val q = st.holding
              st = StratState(t.price, 0.0)
              Some(OrderEvent(accountId, t.seq, t.tsMs, symbol, "sell", "market",
                q, 0.0, t.price))
            } else None
          }
          gs.update(st)
          out.iterator
        })
  }

  // ---------------------------------------------------------- engine loop

  case class EngineState(account: AccountState, strat: Map[String, StratState])

  /** Closed-loop engine: strategy + broker fused in ONE account-keyed
    * stage, the exact analog of the reference loop where
    * `generate_orders(prices, self.broker.account)` reads the LIVE
    * account (paper_trading.py:340-352) — the strategy's holding updates
    * only when the broker actually FILLS, so a cash rejection can never
    * desync the strategy's position belief from the ledger (the hazard
    * the sharded open-loop [[momentumOrders]]→[[broker]] chain accepts
    * for scale-out). One account = one key = inherently sequential (cash
    * is shared across symbols); distinct accounts run in parallel.
    */
  def engineLoop(ticks: Dataset[Tick], accountId: String, qty: Double,
                 band: Double = 0.001,
                 initialCash: Double = InitialCash,
                 commission: Double = DefaultCommission,
                 slippage: Double = DefaultSlippage): Dataset[ExecReport] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_ => accountId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (acct: String, ts: Iterator[Tick], gs: GroupState[EngineState]) => {
          var st = gs.getOption.getOrElse(
            EngineState(AccountState(initialCash, Map.empty, 0L, 0L), Map.empty))
          val out = ts.toSeq.sortBy(t => (t.seq, t.symbol)).flatMap { t =>
            val ss = st.strat.getOrElse(t.symbol, StratState(Double.NaN, 0.0))
            if (ss.ref.isNaN) {
              st = st.copy(strat = st.strat.updated(t.symbol, StratState(t.price, ss.holding)))
              None
            } else {
              val order =
                if (ss.holding == 0.0 && t.price > ss.ref * (1.0 + band))
                  Some(OrderEvent(acct, t.seq, t.tsMs, t.symbol, "buy", "market",
                    qty, 0.0, t.price))
                else if (ss.holding > 0.0 && t.price < ss.ref * (1.0 - band))
                  Some(OrderEvent(acct, t.seq, t.tsMs, t.symbol, "sell", "market",
                    ss.holding, 0.0, t.price))
                else None
              order.map { ev =>
                val (next, rep) = execStep(st.account, ev, commission, slippage)
                // rebase the reference on any attempt; hold position
                // belief to the LEDGER's answer, not the intent
                val held = if (rep.status == "FILLED") rep.position else ss.holding
                st = EngineState(next, st.strat.updated(t.symbol, StratState(t.price, held)))
                rep
              }
            }
          }
          gs.update(st)
          out.iterator
        })
  }

  // ------------------------------------------------------------- summary

  /** Account summary over the execution-report sink
    * (paper_trading.py:214-230 get_account_summary): latest cash and
    * per-symbol positions marked at the latest prices. `lastPrices` is
    * (symbol, price) — at most one row per watchlist symbol, broadcast.
    */
  def accountSummary(reports: DataFrame, lastPrices: DataFrame,
                     initialCash: Double = InitialCash): DataFrame = {
    // two-level single-lineage roll-up (no self-join over the sink): the
    // (account, symbol) partial carries the latest ledger row per symbol;
    // the account level picks the globally-latest cash and marks the
    // positions. Unpriced symbols mark at 0 (prices.get(symbol, 0),
    // paper_trading.py:37).
    // execSeq is the account's own execution counter — strictly
    // increasing, so latest-state picks are total-ordered even when
    // (tsMs, orderId) ties across symbols
    reports
      .groupBy("accountId", "symbol")
      .agg(max(col("execSeq")).as("last_key"),
        max_by(col("cash"), col("execSeq")).as("last_cash"),
        max_by(col("position"), col("execSeq")).as("position"),
        count(lit(1)).as("n_orders"),
        sum(when(col("status") === "FILLED", 1).otherwise(0)).as("n_trades"))
      .join(broadcast(lastPrices), Seq("symbol"), "left")
      .groupBy("accountId")
      .agg(max_by(col("last_cash"), col("last_key")).as("cash"),
        sum(col("n_orders")).as("num_orders"),
        sum(col("n_trades")).as("num_trades"),
        sum(col("position") * coalesce(col("price"), lit(0.0))).as("position_value"))
      .withColumn("portfolio_value", col("cash") + col("position_value"))
      .withColumn("pnl", col("portfolio_value") - lit(initialCash))
      .withColumn("return_pct", (col("portfolio_value") / initialCash - 1) * 100)
  }
}
