package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Information-driven bars as streaming state — the live counterpart of
  * the batch `q_dollar_bars`/`q_volume_bars` (operators/Micro.scala):
  * a bar CLOSES the moment its measure mass reaches the threshold, so
  * an event-clock bar stream needs per-symbol running state, not a
  * time window. State is O(1) per symbol: the running measure total
  * plus the open bar's accumulators. Emission is append-mode on bar
  * close; the open partial bar stays in state (exactly the rows the
  * batch form would not have closed yet).
  *
  * Bar identity matches the batch definition exactly: a tick belongs to
  * bar floor(exclusive running measure / threshold) — all integers, so
  * batch/stream parity is exact (StreamingSpec pins trade-for-trade
  * equality with `Micro.thresholdBars` minus each symbol's open bar).
  */
object StreamingInfoBars {

  case class Tick(symbol: String, ts: Long, event_id: Long, price: Double,
                  vol: Long, cents: Long)

  case class BarAcc(barId: Long, nTicks: Long, open: Double, high: Double,
                    low: Double, close: Double, volume: Long,
                    dollarCents: Long, tsStart: Long, tsEnd: Long)

  case class BarState(cum: Long, acc: Option[BarAcc])

  case class BarRow(symbol: String, bar_id: Long, n_ticks: Long,
                    open: Double, high: Double, low: Double, close: Double,
                    volume: Long, dollar_cents: Long,
                    ts_start: Long, ts_end: Long)

  /** Pure per-tick transition (unit-testable without a stream): folds the
    * tick into its bar and — EAGERLY — emits that bar the moment the
    * running measure total crosses its closing boundary, rather than
    * holding a fully-closed bar until the symbol's next tick arrives
    * (which on a quiet symbol could withhold it indefinitely). Invariant
    * after every step: `acc` is Some only while the bar is still open,
    * i.e. acc.barId == cum / threshold.
    */
  def step(st: BarState, t: Tick, measureOf: Tick => Long,
           threshold: Long): (BarState, Option[BarRow]) = {
    val barId = st.cum / threshold
    val measure = measureOf(t)
    val acc = st.acc match {
      case Some(a) if a.barId == barId =>
        a.copy(nTicks = a.nTicks + 1,
          high = math.max(a.high, t.price), low = math.min(a.low, t.price),
          close = t.price, volume = a.volume + t.vol,
          dollarCents = a.dollarCents + t.cents * t.vol, tsEnd = t.ts)
      case _ =>
        BarAcc(barId, 1L, t.price, t.price, t.price, t.price,
          t.vol, t.cents * t.vol, t.ts, t.ts)
    }
    val newCum = st.cum + measure
    if (newCum / threshold > barId) {
      // this tick's mass crossed the boundary: the bar closed NOW
      (BarState(newCum, None), Some(BarRow(t.symbol, acc.barId, acc.nTicks,
        acc.open, acc.high, acc.low, acc.close, acc.volume, acc.dollarCents,
        acc.tsStart, acc.tsEnd)))
    } else {
      (BarState(newCum, Some(acc)), None)
    }
  }

  /** Dollar bars when `useDollar`, volume bars otherwise. */
  def track(ticks: Dataset[Tick], threshold: Long,
            useDollar: Boolean): Dataset[BarRow] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    val measureOf: Tick => Long =
      if (useDollar) t => t.cents * t.vol else t => t.vol
    ticks
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (_: String, ts: Iterator[Tick], gs: GroupState[BarState]) => {
          var st = gs.getOption.getOrElse(BarState(0L, None))
          // in-batch sort bounded by the trigger interval's tick count
          val out = ts.toSeq.sortBy(t => (t.ts, t.event_id)).flatMap { t =>
            val (next, emitted) = step(st, t, measureOf, threshold)
            st = next
            emitted
          }
          gs.update(st)
          out.iterator
        })
  }
}
