package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** CUSUM event sampling as streaming state — the live counterpart of
  * the batch `q_cusum_events` (operators/Micro.scala): the symmetric
  * cumulative sums reset the moment an event fires, so the filter is
  * per-symbol running state by construction (the same reset feedback
  * that makes the batch form a SortedScan instead of a window). State
  * is four longs + a flag per symbol regardless of history length;
  * emission is append-mode on threshold crossings. Event identity
  * matches the batch definition exactly — all-integer state, so
  * batch/stream parity is exact across any micro-batch split
  * (StreamingSpec pins event-for-event equality with
  * `Micro.cusumEvents`).
  */
object StreamingCusum {

  case class Tick(symbol: String, ts: Long, event_id: Long, cents: Long)

  case class CusumState(prev: Long, hasPrev: Boolean, sp: Long, sm: Long, n: Long)

  case class EventRow(symbol: String, ts: Long, event_id: Long,
                      direction: Int, s_cents: Long, n_ticks: Long)

  /** Pure per-tick transition (unit-testable without a stream). */
  def step(st: CusumState, t: Tick, h: Long): (CusumState, Option[EventRow]) =
    if (!st.hasPrev) (CusumState(t.cents, hasPrev = true, 0L, 0L, 0L), None)
    else {
      val dpc = t.cents - st.prev
      val sp = math.max(0L, st.sp + dpc)
      val sm = math.min(0L, st.sm + dpc)
      val n = st.n + 1
      if (sp >= h)
        (CusumState(t.cents, hasPrev = true, 0L, 0L, 0L),
          Some(EventRow(t.symbol, t.ts, t.event_id, 1, sp, n)))
      else if (sm <= -h)
        (CusumState(t.cents, hasPrev = true, 0L, 0L, 0L),
          Some(EventRow(t.symbol, t.ts, t.event_id, -1, sm, n)))
      else
        (CusumState(t.cents, hasPrev = true, sp, sm, n), None)
    }

  def track(ticks: Dataset[Tick], h: Long = 20L): Dataset[EventRow] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (_: String, ts: Iterator[Tick], gs: GroupState[CusumState]) => {
          var st = gs.getOption.getOrElse(CusumState(0L, hasPrev = false, 0L, 0L, 0L))
          // in-batch sort bounded by the trigger interval's tick count
          val out = ts.toSeq.sortBy(t => (t.ts, t.event_id)).flatMap { t =>
            val (next, emitted) = step(st, t, h)
            st = next
            emitted
          }
          gs.update(st)
          out.iterator
        })
  }
}
