package graft.backtest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trading-signal generators over OHLCV bars.
  *
  * Reference: backtesting/strategy.py (MeanReversionStrategy:71,
  * MovingAverageCrossStrategy:118, MomentumStrategy:150,
  * BuyAndHoldStrategy:195). All are per-symbol window pipelines — rolling
  * frames partitioned by symbol, ordered by bar bucket — so they scale with
  * symbols × bars and never shuffle more than once (the bars aggregate).
  * Bars with an incomplete lookback window get signal 0 (pandas emits NaN
  * there and the reference's comparisons leave those at 0).
  */
object Signals {

  private def w = Window.partitionBy("symbol").orderBy("bucket_ms")

  /** Adds `rn` (1-based bar index per symbol) used for warmup cutoffs. */
  def withRn(bars: DataFrame): DataFrame =
    bars.withColumn("rn", row_number().over(w))

  /** MA crossover: 1 while fast MA > slow MA, else 0 (strategy.py:118). */
  def maCross(bars: DataFrame, fast: Int = 10, slow: Int = 50): DataFrame = {
    val fastMa = avg(col("close")).over(w.rowsBetween(-(fast - 1), 0))
    val slowMa = avg(col("close")).over(w.rowsBetween(-(slow - 1), 0))
    withRn(bars)
      .withColumn("signal",
        when(col("rn") >= slow && fastMa > slowMa, 1).otherwise(0))
  }

  /** Mean reversion: +1 when z < -k, -1 when z > k (strategy.py:71). */
  def meanReversion(bars: DataFrame, window: Int = 20, numStd: Double = 2.0): DataFrame = {
    val frame = w.rowsBetween(-(window - 1), 0)
    val z = (col("close") - avg(col("close")).over(frame)) /
      stddev_samp(col("close")).over(frame)
    withRn(bars)
      .withColumn("signal",
        when(col("rn") < window, 0)
          .when(z < -numStd, 1)
          .when(z > numStd, -1)
          .otherwise(0))
  }

  /** Momentum: ±1 when lookback pct-change exceeds ±threshold
    * (strategy.py:150).
    */
  def momentum(bars: DataFrame, lookback: Int = 20, threshold: Double = 0.02): DataFrame = {
    val mom = col("close") / lag(col("close"), lookback).over(w) - 1
    withRn(bars)
      .withColumn("signal",
        when(col("rn") <= lookback, 0)
          .when(mom > threshold, 1)
          .when(mom < -threshold, -1)
          .otherwise(0))
  }
}
