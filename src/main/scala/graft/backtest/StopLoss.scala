package graft.backtest

import graft.operators.SortedScan
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Trailing stop-loss management.
  *
  * Reference: risk_monitor.py:415 StopLossManager (set_initial_stop,
  * update_trailing_stop, check_stop_hit). A trailing stop's state (entry,
  * peak, stop) depends on every prior exit decision, so — like order
  * matching — it runs as a secondary-sort per-symbol scan: sequential
  * inside a symbol, parallel across symbols, streaming in and out (state
  * is three scalars, never the symbol's bar history).
  */
object StopLoss {

  case class SignalBar(symbol: String, bucket_ms: Long, close: Double, signal: Int)
  case class StopTrade(symbol: String, entry_ms: Long, exit_ms: Long,
                       entry_px: Double, exit_px: Double, peak_px: Double,
                       exit_reason: String)

  /** Enter on signal = +1 (long) / −1 (short, risk_monitor.py:492: the
    * stop trails ABOVE the running trough), trail a pct stop off the
    * running extreme, exit on stop hit / signal flat / end of data.
    * `peak_px` carries the running extreme in both directions. Input
    * MUST already be sorted by bucket_ms.
    */
  def trailingScan(symbol: String, bars: Iterator[SignalBar],
                   trailPct: Double): Iterator[StopTrade] = {
    var side = 0 // +1 long, -1 short, 0 flat
    var entryMs = 0L; var entryPx = 0.0; var peak = 0.0
    var lastMs = 0L; var lastPx = 0.0
    val scanned = bars.flatMap { b =>
      lastMs = b.bucket_ms; lastPx = b.close
      if (side == 0) {
        if (b.signal == 1 || b.signal == -1) {
          side = b.signal; entryMs = b.bucket_ms; entryPx = b.close; peak = b.close
        }
        Iterator.empty
      } else {
        if (side * b.close > side * peak) peak = b.close
        if (side * b.close <= side * peak * (1.0 - side * trailPct)) {
          side = 0
          Iterator.single(StopTrade(symbol, entryMs, b.bucket_ms, entryPx, b.close, peak, "trailing_stop"))
        } else if (b.signal != side) {
          side = 0
          Iterator.single(StopTrade(symbol, entryMs, b.bucket_ms, entryPx, b.close, peak, "signal_exit"))
        } else Iterator.empty
      }
    }
    // ++ is by-name: the end-of-data leg is built only after the scan drains
    scanned ++ (if (side != 0)
      Iterator.single(StopTrade(symbol, entryMs, lastMs, entryPx, lastPx, peak, "end_of_data"))
    else Iterator.empty)
  }

  def run(barsWithSignal: DataFrame, trailPct: Double = 0.02): Dataset[StopTrade] = {
    val spark = barsWithSignal.sparkSession
    import spark.implicits._
    val bars = barsWithSignal.select(col("symbol"), col("bucket_ms"), col("close"),
      col("signal").cast("int").as("signal")).as[SignalBar]
    SortedScan.perKey(bars, Seq("symbol"), Seq("bucket_ms"))(_.symbol)(
      (sym, it) => trailingScan(sym, it, trailPct))
  }
}
