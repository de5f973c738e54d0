package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Exact-infinite EWM/MACD as streaming state — the truncation-free
  * complement of the batch `q_ema_macd` (whose 60-tap bounded window is
  * the set-level, oracle-able form; the infinite recurrence is inherently
  * sequential, i.e. streaming state).
  *
  * pandas `ewm(span, adjust=True)` recurrences per symbol:
  * num_t = x_t + β·num_{t-1}, den_t = 1 + β·den_{t-1}, ema_t = num_t/den_t
  * — O(1) state per (symbol, span). Reference: ml_strategy.py:150
  * (ewm MACD features).
  */
object StreamingEma {

  case class Bar(symbol: String, bucket_ms: Long, close: Double)
  case class EmaState(num12: Double, den12: Double, num26: Double, den26: Double)
  case class EmaRow(symbol: String, bucket_ms: Long, ema12: Double,
                    ema26: Double, macd: Double)

  private val B12 = 1.0 - 2.0 / 13
  private val B26 = 1.0 - 2.0 / 27

  /** Pure transition (unit-testable without a stream). */
  def step(st: EmaState, bar: Bar): (EmaState, EmaRow) = {
    val next = EmaState(
      bar.close + B12 * st.num12, 1.0 + B12 * st.den12,
      bar.close + B26 * st.num26, 1.0 + B26 * st.den26)
    val e12 = next.num12 / next.den12
    val e26 = next.num26 / next.den26
    (next, EmaRow(bar.symbol, bar.bucket_ms, e12, e26, e12 - e26))
  }

  def track(bars: Dataset[Bar]): Dataset[EmaRow] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (_: String, bs: Iterator[Bar], gs: GroupState[EmaState]) => {
          var st = gs.getOption.getOrElse(EmaState(0.0, 0.0, 0.0, 0.0))
          // in-batch sort is bounded by the trigger interval's bar count
          val out = bs.toSeq.sortBy(_.bucket_ms).map { b =>
            val (next, row) = step(st, b)
            st = next
            row
          }
          gs.update(st)
          out.iterator
        })
  }
}
