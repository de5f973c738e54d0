package graft.backtest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Trailing stop-loss management.
  *
  * Reference: risk_monitor.py:415 StopLossManager (set_initial_stop,
  * update_trailing_stop, check_stop_hit). A trailing stop's state (entry,
  * peak, stop) depends on every prior exit decision, so — like order
  * matching — it runs as a typed per-symbol scan: sequential inside a
  * symbol, parallel across symbols, nothing on the driver.
  */
object StopLoss {

  case class SignalBar(symbol: String, bucket_ms: Long, close: Double, signal: Int)
  case class StopTrade(symbol: String, entry_ms: Long, exit_ms: Long,
                       entry_px: Double, exit_px: Double, peak_px: Double,
                       exit_reason: String)

  /** Long-only: enter on signal=1, trail a pct stop under the running
    * peak, exit on stop hit / signal flat / end of data.
    */
  def trailingScan(symbol: String, bars: Iterator[SignalBar],
                   trailPct: Double): Iterator[StopTrade] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[StopTrade]
    var inPos = false
    var entryMs = 0L; var entryPx = 0.0; var peak = 0.0
    var lastMs = 0L; var lastPx = 0.0
    bars.toSeq.sortBy(_.bucket_ms).foreach { b =>
      lastMs = b.bucket_ms; lastPx = b.close
      if (!inPos) {
        if (b.signal == 1) { inPos = true; entryMs = b.bucket_ms; entryPx = b.close; peak = b.close }
      } else {
        if (b.close > peak) peak = b.close
        if (b.close <= peak * (1.0 - trailPct)) {
          out += StopTrade(symbol, entryMs, b.bucket_ms, entryPx, b.close, peak, "trailing_stop")
          inPos = false
        } else if (b.signal == 0) {
          out += StopTrade(symbol, entryMs, b.bucket_ms, entryPx, b.close, peak, "signal_exit")
          inPos = false
        }
      }
    }
    if (inPos) out += StopTrade(symbol, entryMs, lastMs, entryPx, lastPx, peak, "end_of_data")
    out.iterator
  }

  def run(barsWithSignal: DataFrame, trailPct: Double = 0.02): Dataset[StopTrade] = {
    val spark = barsWithSignal.sparkSession
    import spark.implicits._
    barsWithSignal.select(col("symbol"), col("bucket_ms"), col("close"),
      col("signal").cast("int").as("signal")).as[SignalBar]
      .groupByKey(_.symbol)
      .flatMapGroups((sym, it) => trailingScan(sym, it, trailPct))
  }
}
