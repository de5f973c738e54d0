package graft.backtest

import graft.functions.Port
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ML feature engineering over bars.
  *
  * Reference: backtesting/ml_strategy.py:132 TechnicalMLStrategy
  * .engineer_features — RSI(14) from price deltas, Bollinger(20, 2σ),
  * SMA 10/50, volume/SMA20 ratio, 1- and 5-bar returns, 20-bar return
  * volatility. EWM-based MACD is excluded here (infinite-impulse state —
  * covered by the streaming layer, not a set-level query). Only rows with
  * every lookback complete (rn ≥ 50) are emitted, mirroring dropna on the
  * reference's rolling NaNs.
  */
object MlFeatures {

  def compute(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("bucket_ms")
    def frame(k: Int) = w.rowsBetween(-(k - 1), 0)
    val delta = col("close") - lag(col("close"), 1).over(w)
    val gain = avg(when(delta > 0, delta).otherwise(0.0)).over(frame(14))
    val loss = avg(when(delta < 0, -delta).otherwise(0.0)).over(frame(14))
    val sma20 = avg(col("close")).over(frame(20))
    val sd20 = stddev_samp(col("close")).over(frame(20))
    val ret1 = col("close") / lag(col("close"), 1).over(w) - 1
    val volSd20 = stddev_samp(ret1).over(frame(20))

    Signals.withRn(bars)
      .withColumn("returns_1d", ret1)
      .withColumn("returns_5d", col("close") / lag(col("close"), 5).over(w) - 1)
      .withColumn("rsi",
        when(loss === 0 && gain === 0, lit(null))
          .when(loss === 0, 100.0)
          .otherwise(Port.r(lit(100.0) - lit(100.0) / (lit(1.0) + gain / loss), 4)))
      .withColumn("bb_upper", Port.r(sma20 + sd20 * 2, 6))
      .withColumn("bb_lower", Port.r(sma20 - sd20 * 2, 6))
      .withColumn("sma_fast", Port.r(avg(col("close")).over(frame(10)), 6))
      .withColumn("sma_slow", Port.r(avg(col("close")).over(frame(50)), 6))
      .withColumn("volume_sma_ratio",
        Port.r(col("volume") / avg(col("volume")).over(frame(20)), 6))
      .withColumn("volatility", Port.r(volSd20, 8))
      .filter(col("rn") >= 50)
      .select(col("symbol"), col("bucket_ms"), col("close"),
        col("returns_1d"), col("returns_5d"), col("rsi"), col("bb_upper"),
        col("bb_lower"), col("sma_fast"), col("sma_slow"),
        col("volume_sma_ratio"), col("volatility"))
  }
}
