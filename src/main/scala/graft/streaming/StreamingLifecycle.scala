package graft.streaming

import graft.operators.OrderLifecycle
import graft.operators.OrderLifecycle.{BookEvent, LifecycleSim, LifecycleState, LifecycleTrade}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live order-lifecycle tracking: the same transition machine as the
  * batch [[graft.operators.OrderLifecycle]] run as Structured Streaming
  * state (`flatMapGroupsWithState` keyed by symbol).
  *
  * Reference: paper_trading.py PaperBroker (live order flow against a
  * simulated book) and engine.py EventDrivenEngine — the streaming analog
  * of the batch replay. The simulator snapshots its full state (resting
  * book, lazy-cancel set, pending queue, ledger) into the group state
  * after each micro-batch and restores it on the next, so a limit order
  * resting in one batch fills on a tick that arrives minutes later, and
  * a fresh tick stream resumes exactly where the last batch stopped —
  * StreamingSpec asserts trade-for-trade parity with the batch scan over
  * the concatenated events.
  */
object StreamingLifecycle {

  def track(events: Dataset[BookEvent]): Dataset[LifecycleTrade] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (symbol: String, evs: Iterator[BookEvent], gs: GroupState[LifecycleState]) => {
          val sim = gs.getOption
            .map(st => LifecycleSim.restore(symbol, st))
            .getOrElse(LifecycleSim.fresh(symbol))
          // micro-batch-bounded sort (trigger-interval event count, not
          // history): groups arrive unsorted inside a batch
          val out = evs.toSeq.sortBy(e => (e.ts, e.event_id))
            .flatMap(e => sim.onEvent(e).toSeq)
          gs.update(sim.snapshot)
          out.iterator
        })
  }
}
