package graft.backtest

import graft.functions.Port
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Performance metrics over a backtest result (one row per symbol).
  *
  * Reference: backtesting/metrics.py PerformanceMetrics.get_all_metrics —
  * same 15 statistics, computed as a single hash aggregate per symbol
  * instead of 15 pandas passes. Annualization uses the reference defaults
  * (252 periods/year, 2% risk-free). Transcendental outputs are snapped
  * with Port.r; profit_factor emits NULL where the reference emits inf
  * (no losing periods).
  */
object Metrics {
  val PeriodsPerYear = 252.0
  val RiskFree = 0.02
  val RfPerPeriod: Double = RiskFree / PeriodsPerYear

  def compute(backtest: DataFrame, keys: Seq[String] = Seq("symbol")): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy("bucket_ms")
      .rowsBetween(Window.unboundedPreceding, 0)
    val withPeak = backtest
      .withColumn("log_peak", max(col("log_equity")).over(w))
      .withColumn("dd", exp(col("log_equity") - col("log_peak")) - 1)
      .withColumn("prev_pos", lag(col("position"), 1).over(
        Window.partitionBy(keys.map(col): _*).orderBy("bucket_ms")))

    val net = col("net_returns")
    val excess = net - RfPerPeriod
    // log-domain total return: Σ ln(1+net); exp() of it overflows any
    // portable rounding at synthetic volatilities, so the log is the metric.
    val logTotal = sum(log(lit(1.0) + greatest(net, lit(-0.9999))))
    val n = count(lit(1)).cast("double")
    val cagr = exp(logTotal * lit(PeriodsPerYear) / n) - 1
    val sd = stddev_samp(net)
    val sdEx = stddev_samp(excess)
    val downside = stddev_samp(when(excess < 0, excess))
    val mdd = min(col("dd"))
    val gains = sum(when(net > 0, net).otherwise(0.0))
    val losses = abs(sum(when(net < 0, net).otherwise(0.0)))
    val nonzero = sum(when(net =!= 0, 1.0).otherwise(0.0))
    val wins = sum(when(net > 0, 1.0).otherwise(0.0))

    def z(c: Column): Column = coalesce(c, lit(0.0))

    withPeak
      .groupBy(keys.map(col): _*)
      .agg(
        Port.r(logTotal, 6).as("log_total_return"),
        Port.r(cagr, 6).as("cagr"),
        Port.r(sd * math.sqrt(PeriodsPerYear), 6).as("volatility"),
        Port.r(z(when(sdEx =!= 0, avg(excess) / sdEx * math.sqrt(PeriodsPerYear))), 6).as("sharpe_ratio"),
        Port.r(z(when(downside =!= 0, avg(excess) / downside * math.sqrt(PeriodsPerYear))), 6).as("sortino_ratio"),
        Port.r(mdd, 6).as("max_drawdown"),
        Port.r(z(when(abs(mdd) > 0, cagr / abs(mdd))), 6).as("calmar_ratio"),
        Port.r(z(when(nonzero > 0, wins / nonzero)), 6).as("win_rate"),
        when(losses =!= 0, Port.r(gains / losses, 6)).as("profit_factor"),
        sum(when(col("prev_pos").isNotNull && col("position") =!= col("prev_pos"), 1L).otherwise(0L)).as("num_trades"),
        Port.r(sum(when(col("position") =!= 0, 1.0).otherwise(0.0)) / n, 6).as("exposure"),
        Port.r(z(when(wins > 0, gains / wins)), 8).as("average_win"),
        Port.r(z(when(nonzero - wins > 0, -losses / (nonzero - wins))), 8).as("average_loss")
      )
  }
}
