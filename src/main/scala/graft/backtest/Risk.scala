package graft.backtest

import graft.functions.Port
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Risk analytics: historical VaR/CVaR, Kelly and volatility position
  * sizing, limit-breach monitoring.
  *
  * Reference: backtesting/risk_monitor.py (RiskMonitor:56,75 —
  * interpolated-quantile VaR, mean-below-VaR CVaR; PositionSizer:332,360;
  * monitor/check_* :120-278). Spark shape: per-symbol stats in one
  * aggregate, broadcast back where a second pass needs them.
  */
object Risk {

  /** Per-symbol bar returns (null first bar dropped). */
  def barReturns(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("bucket_ms")
    bars
      .withColumn("r", col("close") / lag(col("close"), 1).over(w) - 1)
      .filter(col("r").isNotNull)
      .select("symbol", "bucket_ms", "r")
  }

  /** VaR(95/99) + CVaR(95) per symbol (risk_monitor.py:56,75).
    *
    * Single-pass shape: the returns stream is exchanged by symbol ONCE
    * (the lag window), the interpolated percentiles ride that same
    * partitioning as per-partition window aggregates, and the final
    * groupBy reuses the partitioning again — no second scan, no
    * broadcast-join re-shuffle (the r06 form paid both: a percentile
    * aggregate, then a re-scan of the returns joined back for CVaR).
    */
  def varCvar(bars: DataFrame): DataFrame =
    varCvarOn(barReturns(bars), percentile(col("r"), lit(0.05)),
      percentile(col("r"), lit(0.01)))

  /** Production variant for unbounded per-symbol history: exact
    * `percentile` is a sort-based aggregate that buffers a symbol's full
    * return history in one buffer — fine at bar granularity, the one
    * unbounded-memory aggregate in the engine at tick-scale history.
    * `approx_percentile` (GK sketch) holds O(accuracy) state at a
    * guaranteed rank error ≤ n/accuracy; the oracled q_var_cvar keeps
    * the exact form (RiskApproxSpec pins the error bound).
    */
  def varCvarApprox(bars: DataFrame, accuracy: Int = 10000): DataFrame =
    varCvarOn(barReturns(bars),
      approx_percentile(col("r"), lit(0.05), lit(accuracy)),
      approx_percentile(col("r"), lit(0.01), lit(accuracy)))

  /** Driver-visible referee for the sketch path (r15): runs the GK
    * sketch over the same returns and judges each symbol's 5%/1%
    * estimates against the sketch's GUARANTEED rank-error bound,
    * returning per-symbol 0/1 flags. With duplicate values the returned
    * estimate v occupies the rank interval [count(r < v)+1,
    * count(r <= v)], so the check is interval-vs-target: count(r < v)
    * ≤ p·n + err and count(r <= v) ≥ p·n − err, with err = n/accuracy
    * + 2 (the +2 absorbs the off-by-one between target-rank
    * conventions). The flags are engine-portable integers — the DuckDB
    * mirror emits literal 1s, so a sketch drifting out of its bound
    * flips a flag and fails the driver's hash compare.
    */
  def sketchRankChecks(rets: DataFrame, accuracy: Int = 10000): DataFrame = {
    val approx = rets.groupBy("symbol").agg(
      approx_percentile(col("r"), lit(0.05), lit(accuracy)).as("a95"),
      approx_percentile(col("r"), lit(0.01), lit(accuracy)).as("a99"))
    def ok(lo: Column, hi: Column, p: Double, n: Column): Column = {
      val target = n.cast("double") * p
      val err = n.cast("double") / accuracy + 2.0
      (lo.cast("double") <= target + err && hi.cast("double") >= target - err)
        .cast("int")
    }
    rets.join(broadcast(approx), "symbol")
      .groupBy("symbol")
      .agg(count(lit(1)).as("nc"),
        sum(when(col("r") < col("a95"), 1L).otherwise(0L)).as("lo95"),
        sum(when(col("r") <= col("a95"), 1L).otherwise(0L)).as("hi95"),
        sum(when(col("r") < col("a99"), 1L).otherwise(0L)).as("lo99"),
        sum(when(col("r") <= col("a99"), 1L).otherwise(0L)).as("hi99"))
      .select(col("symbol"),
        ok(col("lo95"), col("hi95"), 0.05, col("nc")).as("sketch_ok_95"),
        ok(col("lo99"), col("hi99"), 0.01, col("nc")).as("sketch_ok_99"))
  }

  /** The VaR/CVaR aggregate expressions — the ONE definition of the
    * oracle contract. RiskPack.riskStats builds its fused memoized frame
    * from these same columns (via varCvarOn's extraAggs), so an edit here
    * can never desync q_var_cvar / q_risk_snapshot from the oracle.
    */
  private[backtest] def varCvarAggs(p99: Column): Seq[Column] = Seq(
    Port.r(first(col("var_95_raw")), 8).as("var_95"),
    Port.r(p99, 8).as("var_99"),
    Port.r(avg(when(col("r") <= col("var_95_raw"), col("r"))), 8).as("cvar_95"),
    count(lit(1)).as("n")
  )

  /** Annualized mean/vol aggregate expressions shared by volSizing and
    * RiskPack.riskStats (one definition per formula, same reason as
    * varCvarAggs).
    */
  private[backtest] val annStatsAggs: Seq[Column] = Seq(
    Port.r(avg(col("r")) * 252, 8).as("mean_return_ann"),
    Port.r(stddev_samp(col("r")) * math.sqrt(252.0), 8).as("volatility_ann")
  )

  /** Volatility-target sizing columns over (mean_return_ann,
    * volatility_ann) — shared by volSizing and q_vol_position_sizing.
    */
  private[backtest] def sizingCols(portfolioValue: Double, targetVol: Double,
                                   maxPosition: Double): Seq[(String, Column)] = Seq(
    "position_fraction" ->
      Port.r(when(col("volatility_ann") === 0, 0.0)
        .otherwise(least(lit(targetVol) / col("volatility_ann"), lit(maxPosition))), 6),
    "position_dollars" ->
      Port.r(col("position_fraction") * portfolioValue, 2)
  )

  /** Only the 5% quantile is needed PER-ROW (the CVaR conditional); it
    * rides the symbol partitioning as a window aggregate. The 1% quantile
    * is a plain aggregate in the final groupBy — same rows, same value,
    * one window fewer. extraAggs lets a caller fuse more per-symbol
    * aggregates into the same single pass (RiskPack.riskStats).
    */
  private[backtest] def varCvarOn(rets: DataFrame, p95: Column, p99: Column,
                                  extraAggs: Seq[Column] = Nil): DataFrame = {
    val aggs = varCvarAggs(p99) ++ extraAggs
    rets
      .withColumn("var_95_raw", p95.over(Window.partitionBy("symbol")))
      .groupBy("symbol")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Kelly fraction from a backtest's net returns (risk_monitor.py:332):
    * quarter-Kelly, capped to [0, maxPosition].
    */
  def kelly(backtest: DataFrame, maxPosition: Double = graft.GraftConfig.active.maxPosition): DataFrame = {
    val net = col("net_returns")
    val wins = sum(when(net > 0, 1.0).otherwise(0.0))
    val nonzero = sum(when(net =!= 0, 1.0).otherwise(0.0))
    val gains = sum(when(net > 0, net).otherwise(0.0))
    val losses = abs(sum(when(net < 0, net).otherwise(0.0)))
    backtest.groupBy("symbol")
      .agg(
        Port.r(coalesce(when(nonzero > 0, wins / nonzero), lit(0.0)), 6).as("win_rate"),
        Port.r(coalesce(when(wins > 0, gains / wins), lit(0.0)), 8).as("avg_win"),
        Port.r(coalesce(when(nonzero - wins > 0, losses / (nonzero - wins)), lit(0.0)), 8).as("avg_loss"))
      .withColumn("kelly_fraction", {
        val r = col("avg_win") / col("avg_loss")
        val k = (col("win_rate") * r - (lit(1.0) - col("win_rate"))) / r * 0.25
        Port.r(when(col("avg_loss") === 0, 0.0)
          .otherwise(least(greatest(k, lit(0.0)), lit(maxPosition))), 6)
      })
  }

  /** Volatility-targeted sizing + annualized stats per symbol
    * (risk_monitor.py:360; portfolio_optimization.py:22 annualization).
    */
  def volSizing(bars: DataFrame, portfolioValue: Double = 1000000.0,
                targetVol: Double = graft.GraftConfig.active.targetVol, maxPosition: Double = graft.GraftConfig.active.maxPosition): DataFrame =
    sizingCols(portfolioValue, targetVol, maxPosition)
      .foldLeft(barReturns(bars).groupBy("symbol")
        .agg(annStatsAggs.head, annStatsAggs.tail: _*)) {
        case (df, (name, c)) => df.withColumn(name, c)
      }

  /** Limit-breach monitoring over a backtest (risk_monitor.py:155-278):
    * daily-loss and drawdown threshold alerts per symbol.
    */
  def limitAlerts(backtest: DataFrame,
                  ddThreshold: Double = 0.20, dailyLossLimit: Double = 0.05): DataFrame = {
    val cum = Window.partitionBy("symbol").orderBy("bucket_ms")
      .rowsBetween(Window.unboundedPreceding, 0)
    val withDd = backtest
      .withColumn("dd", exp(col("log_equity") - max(col("log_equity")).over(cum)) - 1)
      .withColumn("day_ms", expr("bucket_ms div 86400000") * 86400000L)
    val daily = withDd.groupBy("symbol", "day_ms")
      .agg(sum(col("net_returns")).as("day_net"), min(col("dd")).as("day_min_dd"))
    daily.groupBy("symbol")
      .agg(
        sum(when(col("day_net") < -dailyLossLimit, 1L).otherwise(0L)).as("n_daily_loss_alerts"),
        sum(when(col("day_min_dd") < -ddThreshold, 1L).otherwise(0L)).as("n_drawdown_alert_days"),
        Port.r(min(col("day_net")), 8).as("worst_daily_net"),
        Port.r(min(col("day_min_dd")), 6).as("worst_drawdown"))
  }
}
