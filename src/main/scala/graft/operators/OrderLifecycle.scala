package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Full order-lifecycle simulation: market orders, limit orders, cancels,
  * and tick-driven execution against a per-symbol account ledger.
  *
  * Reference: order_book.py EventDrivenSimulator —
  *  - submit_order (:245): orders queue as pending until a tick arrives;
  *  - process_tick (:391): on each tick, pending market orders execute at
  *    tick price ± slippage (:268 process_market_order), pending limit
  *    orders execute at their limit price if marketable else rest in the
  *    book (:302 process_limit_order), then resting orders whose limit
  *    crosses the tick fill at their own price (:427 _match_orders);
  *  - remove_order (:109): cancels are lazy — the order is flagged and
  *    skipped when popped (the reference's status check at :449);
  *  - _execute_trade (:333): buys require cash ≥ qty·px·(1+fee), sells
  *    require position ≥ qty, else the order is REJECTED.
  *
  * Two account modes:
  *  - [[run]] shards the cash account per symbol (one ledger per symbol
  *    task) — the shape that parallelizes within one account, at a
  *    documented deviation from the reference's global account.
  *  - [[runSharedAccount]] is the reference's exact model
  *    (order_book.py:333: ONE cash account across symbols, per-symbol
  *    positions): a shared ledger is inherently sequential across its
  *    symbols, so the distributed unit becomes the ACCOUNT — events
  *    partition by account key, one task replays that account's symbols
  *    interleaved in global (ts, event_id) order, accounts parallelize
  *    across the cluster.
  *
  * Execution is a SortedScan per key: sequential in (ts, event_id)
  * inside a key, parallel across keys; state is the resting book +
  * ledger scalars, never the event history. The same transition
  * machine ([[LifecycleSim]]) backs graft.streaming.StreamingLifecycle,
  * which snapshots/restores it across micro-batches.
  */
object OrderLifecycle {

  val InitialCash = 1000000.0
  val Commission = 0.001
  val Slippage = 0.0005

  /** kind ∈ {limit, market, cancel, tick}; ref_id targets a prior order's
    * event_id for cancels; price is the limit/tick price (unused for
    * market/cancel submits).
    */
  case class BookEvent(symbol: String, ts: Long, event_id: Long, kind: String,
                       side: String, price: Double, qty: Double, ref_id: Long)

  /** One execution: fill_kind ∈ {market, limit_immediate, book_cross}. */
  case class LifecycleTrade(symbol: String, trade_seq: Long, order_event_id: Long,
                            side: String, fill_kind: String, qty: Double,
                            price: Double, commission: Double, ts: Long)

  case class Open(event_id: Long, ts: Long, side: String,
                  price: Double, qty: Double)

  /** Encoder-friendly snapshot of a simulator's full state. */
  case class LifecycleState(book: Seq[Open], cancelled: Seq[Long],
                            pending: Seq[BookEvent], cash: Double,
                            position: Double, seq: Long)

  /** A cash account: one global cash pool + per-symbol positions — the
    * reference's exact account state (order_book.py:227-228). Owned by
    * one task; shared across that account's [[LifecycleSim]]s in
    * shared-account mode, private to one sim in per-symbol mode.
    */
  final class Ledger(var cash: Double) {
    val positions: mutable.Map[String, Double] =
      mutable.HashMap.empty[String, Double].withDefaultValue(0.0)
  }

  /** The sequential per-symbol transition machine. Mutable by design —
    * one instance lives inside one task (batch scan) or one group-state
    * slot (streaming); events MUST arrive in (ts, event_id) order.
    */
  final class LifecycleSim(symbol: String,
                           private val ledger: Ledger = new Ledger(InitialCash)) {
    private val buys = mutable.PriorityQueue.empty[Open](
      Ordering.by((o: Open) => (o.price, -o.ts, -o.event_id)))
    private val sells = mutable.PriorityQueue.empty[Open](
      Ordering.by((o: Open) => (-o.price, -o.ts, -o.event_id)))
    private val cancelled = mutable.HashSet.empty[Long] // lazy deletion
    private val resting = mutable.HashSet.empty[Long]
    private val pending = mutable.ArrayBuffer.empty[BookEvent]
    private def cash = ledger.cash
    private def position = ledger.positions(symbol)
    private var seq = 0L

    private def execute(eventId: Long, side: String, kind: String, qty: Double,
                        px: Double, ts: Long): Option[LifecycleTrade] = {
      val fee = qty * px * Commission
      if (side == "buy") {
        if (cash < qty * px + fee) None // REJECTED
        else {
          ledger.cash -= qty * px + fee
          ledger.positions(symbol) = position + qty
          seq += 1
          Some(LifecycleTrade(symbol, seq, eventId, side, kind, qty, px, fee, ts))
        }
      } else {
        if (position < qty) None // REJECTED
        else {
          ledger.cash += qty * px - fee
          ledger.positions(symbol) = position - qty
          seq += 1
          Some(LifecycleTrade(symbol, seq, eventId, side, kind, qty, px, fee, ts))
        }
      }
    }

    private def onTick(px: Double, ts: Long): Iterator[LifecycleTrade] = {
      val out = mutable.ArrayBuffer.empty[LifecycleTrade] // bounded per tick
      // 1. pending orders, submission order (process_tick :407)
      pending.foreach { o =>
        if (o.kind == "market") {
          val exec = if (o.side == "buy") px * (1 + Slippage) else px * (1 - Slippage)
          execute(o.event_id, o.side, "market", o.qty, exec, ts).foreach(out += _)
        } else { // limit
          val marketable = (o.side == "buy" && px <= o.price) ||
            (o.side == "sell" && px >= o.price)
          if (marketable)
            execute(o.event_id, o.side, "limit_immediate", o.qty, o.price, ts).foreach(out += _)
          else {
            resting += o.event_id
            val open = Open(o.event_id, o.ts, o.side, o.price, o.qty)
            if (o.side == "buy") buys.enqueue(open) else sells.enqueue(open)
          }
        }
      }
      pending.clear()
      // 2. book crossings at the resting order's own price (_match_orders :427)
      while (buys.nonEmpty && buys.head.price >= px) {
        val o = buys.dequeue()
        if (!cancelled.remove(o.event_id)) {
          resting -= o.event_id
          execute(o.event_id, "buy", "book_cross", o.qty, o.price, ts).foreach(out += _)
        }
      }
      while (sells.nonEmpty && sells.head.price <= px) {
        val o = sells.dequeue()
        if (!cancelled.remove(o.event_id)) {
          resting -= o.event_id
          execute(o.event_id, "sell", "book_cross", o.qty, o.price, ts).foreach(out += _)
        }
      }
      out.iterator
    }

    def onEvent(e: BookEvent): Iterator[LifecycleTrade] = e.kind match {
      case "tick" => onTick(e.price, e.ts)
      case "cancel" =>
        // remove_order :109 — only resting orders cancel; pending/filled no-op
        if (resting.remove(e.ref_id)) cancelled += e.ref_id
        Iterator.empty
      case _ =>
        pending += e
        Iterator.empty
    }

    def snapshot: LifecycleState =
      LifecycleState((buys.toSeq ++ sells.toSeq).sortBy(_.event_id),
        cancelled.toSeq.sorted, pending.toSeq, cash, position, seq)
  }

  object LifecycleSim {
    def fresh(symbol: String): LifecycleSim = new LifecycleSim(symbol)

    def restore(symbol: String, st: LifecycleState): LifecycleSim = {
      val sim = new LifecycleSim(symbol)
      val dead = st.cancelled.toSet
      st.book.foreach { o =>
        // cancelled orders stay in the heap (lazy deletion) but are not resting
        if (!dead(o.event_id)) sim.resting += o.event_id
        if (o.side == "buy") sim.buys.enqueue(o) else sim.sells.enqueue(o)
      }
      sim.cancelled ++= st.cancelled
      sim.pending ++= st.pending
      sim.ledger.cash = st.cash
      sim.ledger.positions(symbol) = st.position
      sim.seq = st.seq
      sim
    }
  }

  /** Scan one symbol's event flow. Input MUST be sorted by (ts, event_id);
    * trades stream out per tick.
    */
  def scanSymbol(symbol: String, events: Iterator[BookEvent]): Iterator[LifecycleTrade] = {
    val sim = LifecycleSim.fresh(symbol)
    events.flatMap(sim.onEvent)
  }

  def run(events: Dataset[BookEvent]): Dataset[LifecycleTrade] = {
    val spark = events.sparkSession
    import spark.implicits._
    SortedScan.perKey(events, Seq("symbol"), Seq("ts", "event_id"))(_.symbol)(scanSymbol)
  }

  /** A [[BookEvent]] keyed by the cash account it trades against. */
  case class AccountEvent(account: String, symbol: String, ts: Long,
                          event_id: Long, kind: String, side: String,
                          price: Double, qty: Double, ref_id: Long) {
    def event: BookEvent =
      BookEvent(symbol, ts, event_id, kind, side, price, qty, ref_id)
  }

  /** Replay one account's whole event flow — all symbols interleaved in
    * (ts, event_id) order — against ONE shared ledger, one sim per
    * symbol. Exactly order_book.py's account model: a buy in one symbol
    * can starve a later buy in another.
    */
  def scanAccount(account: String,
                  events: Iterator[AccountEvent]): Iterator[LifecycleTrade] = {
    val ledger = new Ledger(InitialCash)
    val sims = mutable.HashMap.empty[String, LifecycleSim]
    events.flatMap { ae =>
      sims.getOrElseUpdate(ae.symbol, new LifecycleSim(ae.symbol, ledger))
        .onEvent(ae.event)
    }
  }

  /** Shared-account mode: partition by account, replay symbols
    * sequentially inside each account task. State per task is the open
    * books + one ledger — bounded regardless of history length.
    */
  def runSharedAccount(events: Dataset[AccountEvent]): Dataset[LifecycleTrade] = {
    val spark = events.sparkSession
    import spark.implicits._
    SortedScan.perKey(events, Seq("account"), Seq("ts", "event_id"))(_.account)(scanAccount)
  }

  /** The tick feed as a deterministic mixed event stream: by user decile —
    * 0 → market order, 1 → cancel of the latest prior limit-order event
    * (may target an already-filled/absent order: a no-op, as the
    * reference), 2-4 → limit order (price snapped around the tick),
    * 5-9 → market tick.
    */
  def eventsFromTicks(ticks: DataFrame): Dataset[BookEvent] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    val decile = col("user_id") % 10
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("symbol").orderBy("ts", "event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val kind = when(decile === 0, "market")
      .when(decile === 1, "cancel")
      .when(decile <= 4, "limit")
      .otherwise("tick")
    ticks
      .select(col("symbol"), col("ts"), col("event_id"), kind.as("kind"),
        when(col("user_id") % 2 === 0, "buy").otherwise("sell").as("side"),
        // limit prices straddle the tick stream: ±0.5% by event parity
        when(kind === "limit",
          col("price") * (lit(1.0) + (col("event_id") % 2 * 2 - 1) * 0.005))
          .otherwise(col("price")).as("price"),
        col("volume").as("qty"))
      .withColumn("ref_id", coalesce(
        last(when(col("kind") === "limit", col("event_id")), ignoreNulls = true).over(w),
        lit(-1L)))
      .as[BookEvent]
  }

  /** The same synthetic event stream keyed to one shared account. */
  def accountEventsFromTicks(ticks: DataFrame,
                             account: String = "primary"): Dataset[AccountEvent] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    eventsFromTicks(ticks).withColumn("account", lit(account)).as[AccountEvent]
  }
}
