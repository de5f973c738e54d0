package graft.backtest

import graft.QueryPack

/** Shared DuckDB CTE fragments mirroring the Spark backtest pipeline —
  * the oracle side of Signals/Backtester. Every formula matches the Spark
  * Column expressions token-for-token so identical doubles flow through
  * both engines.
  */
object BtSql {

  /** bars(sec) + ma-cross(10/50) signal + vectorized backtest with equity.
    * Final CTE name: `bt`.
    */
  def maCrossChain(sec: Long): String =
    chainFromBars(QueryPack.barsCteAt(sec))

  /** The signal -> backtest tail over ANY prefix whose final CTE is
    * `bars` — the composed market job feeds CLEANED bars through the
    * identical chain. Final CTE: `bt`.
    */
  def chainFromBars(barsPrefix: String): String =
    barsPrefix + """,
      |sig AS (
      |  -- exact ma-cross decision (r16): integer-CENT prefix sums
      |  -- (integer-valued doubles are exact below 2^53 in any
      |  -- association) and the cross-multiplied comparison — the true
      |  -- rational fast/slow MA ordering, engine-independent, matching
      |  -- Signals.maCrossPlain by arithmetic instead of by ulp luck.
      |  SELECT symbol, bucket_ms, close,
      |         row_number() OVER w AS rn,
      |         sum(floor(close * 100 + 0.5)) OVER (
      |           w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS csum
      |  FROM bars WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ms)
      |),
      |sig2 AS (
      |  SELECT symbol, bucket_ms, close, rn,
      |         CASE WHEN rn >= 50
      |                AND (csum - coalesce(lag(csum, 10) OVER w, 0.0)) * 50
      |                  > (csum - coalesce(lag(csum, 50) OVER w, 0.0)) * 10
      |              THEN 1 ELSE 0 END AS signal
      |  FROM sig WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ms)
      |),
      |bt0 AS (
      |  SELECT symbol, bucket_ms, close, signal,
      |         CAST(signal AS DOUBLE) AS position,
      |         CAST(signal AS DOUBLE) - coalesce(lag(CAST(signal AS DOUBLE)) OVER w, 0.0) AS trade,
      |         coalesce(close / lag(close) OVER w - 1, 0.0) AS returns,
      |         coalesce(lag(CAST(signal AS DOUBLE)) OVER w, 0.0)
      |           * coalesce(close / lag(close) OVER w - 1, 0.0) AS strategy_returns
      |  FROM sig2 WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ms)
      |),
      |bt1 AS (
      |  SELECT *, abs(trade) * 0.0015 AS costs,
      |         strategy_returns - abs(trade) * 0.0015 AS net_returns
      |  FROM bt0
      |),
      |bt AS (
      |  SELECT *,
      |         CAST(sum(CAST(floor(ln(1.0 + greatest(net_returns, -0.9999)) * 1e8 + 0.5) AS BIGINT)) OVER (
      |           PARTITION BY symbol ORDER BY bucket_ms
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e8 AS log_equity
      |  FROM bt1
      |)""".stripMargin

  /** 1-min ma-cross backtest chain. */
  val MaCrossBacktestCte: String = maCrossChain(60)

  /** The full 14-metric SELECT over a `wp` CTE, grouped by `groupCols`
    * (mirror of graft.backtest.Metrics.compute).
    */
  def metricsSelect(groupCols: String): String =
    s"""SELECT $groupCols,
       |  floor(sum(ln(1.0 + greatest(net_returns, -0.9999))) * 1e6 + 0.5) / 1e6 AS log_total_return,
       |  floor((exp(sum(ln(1.0 + greatest(net_returns, -0.9999))) * 252.0 / CAST(count(*) AS DOUBLE)) - 1) * 1e6 + 0.5) / 1e6 AS cagr,
       |  floor(stddev_samp(net_returns) * sqrt(252.0) * 1e6 + 0.5) / 1e6 AS volatility,
       |  floor(coalesce(CASE WHEN stddev_samp(net_returns - 0.02/252) != 0
       |    THEN avg(net_returns - 0.02/252) / stddev_samp(net_returns - 0.02/252) * sqrt(252.0) END, 0.0) * 1e6 + 0.5) / 1e6 AS sharpe_ratio,
       |  floor(coalesce(CASE WHEN stddev_samp(CASE WHEN net_returns - 0.02/252 < 0 THEN net_returns - 0.02/252 END) != 0
       |    THEN avg(net_returns - 0.02/252) / stddev_samp(CASE WHEN net_returns - 0.02/252 < 0 THEN net_returns - 0.02/252 END) * sqrt(252.0) END, 0.0) * 1e6 + 0.5) / 1e6 AS sortino_ratio,
       |  floor(min(dd) * 1e6 + 0.5) / 1e6 AS max_drawdown,
       |  floor(coalesce(CASE WHEN abs(min(dd)) > 0
       |    THEN (exp(sum(ln(1.0 + greatest(net_returns, -0.9999))) * 252.0 / CAST(count(*) AS DOUBLE)) - 1) / abs(min(dd)) END, 0.0) * 1e6 + 0.5) / 1e6 AS calmar_ratio,
       |  floor(coalesce(CASE WHEN sum(CASE WHEN net_returns != 0 THEN 1.0 ELSE 0.0 END) > 0
       |    THEN sum(CASE WHEN net_returns > 0 THEN 1.0 ELSE 0.0 END) / sum(CASE WHEN net_returns != 0 THEN 1.0 ELSE 0.0 END) END, 0.0) * 1e6 + 0.5) / 1e6 AS win_rate,
       |  CASE WHEN abs(sum(CASE WHEN net_returns < 0 THEN net_returns ELSE 0.0 END)) != 0
       |    THEN floor(sum(CASE WHEN net_returns > 0 THEN net_returns ELSE 0.0 END) / abs(sum(CASE WHEN net_returns < 0 THEN net_returns ELSE 0.0 END)) * 1e6 + 0.5) / 1e6 END AS profit_factor,
       |  CAST(sum(CASE WHEN prev_pos IS NOT NULL AND position != prev_pos THEN 1 ELSE 0 END) AS BIGINT) AS num_trades,
       |  floor(sum(CASE WHEN position != 0 THEN 1.0 ELSE 0.0 END) / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS exposure,
       |  floor(coalesce(CASE WHEN sum(CASE WHEN net_returns > 0 THEN 1.0 ELSE 0.0 END) > 0
       |    THEN sum(CASE WHEN net_returns > 0 THEN net_returns ELSE 0.0 END) / sum(CASE WHEN net_returns > 0 THEN 1.0 ELSE 0.0 END) END, 0.0) * 1e8 + 0.5) / 1e8 AS average_win,
       |  floor(coalesce(CASE WHEN sum(CASE WHEN net_returns != 0 THEN 1.0 ELSE 0.0 END) - sum(CASE WHEN net_returns > 0 THEN 1.0 ELSE 0.0 END) > 0
       |    THEN -abs(sum(CASE WHEN net_returns < 0 THEN net_returns ELSE 0.0 END)) / (sum(CASE WHEN net_returns != 0 THEN 1.0 ELSE 0.0 END) - sum(CASE WHEN net_returns > 0 THEN 1.0 ELSE 0.0 END)) END, 0.0) * 1e8 + 0.5) / 1e8 AS average_loss
       |FROM wp GROUP BY $groupCols ORDER BY $groupCols""".stripMargin

  /** Stacked three-strategy chain keyed by (strategy, symbol): signals →
    * UNION ALL → vectorized backtest → peak/drawdown (final CTE: wp).
    */
  val StackedStrategiesWithPeakCte: String =
    graft.QueryPack.BarsCte + """,
      |sigall AS (
      |  -- ma-cross decided on integer-CENT sliding sums (exact in any
      |  -- association below 2^53): for rn >= 50 these equal the Spark
      |  -- prefix-sum differences bit-for-bit — see BtSql.chainFromBars.
      |  SELECT symbol, bucket_ms, close,
      |         row_number() OVER w AS rn,
      |         sum(floor(close * 100 + 0.5))
      |           OVER (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS fast_c,
      |         sum(floor(close * 100 + 0.5))
      |           OVER (w ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) AS slow_c,
      |         sum(floor(close * 100 + 0.5))
      |           OVER (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS s1c,
      |         sum(floor(close * 100 + 0.5) * floor(close * 100 + 0.5))
      |           OVER (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS s2c,
      |         lag(close, 20) OVER w AS lag20
      |  FROM bars WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ms)
      |),
      |stacked AS (
      |  SELECT 'ma_cross' AS strategy, symbol, bucket_ms, close,
      |         CASE WHEN rn >= 50 AND fast_c * 50 > slow_c * 10 THEN 1 ELSE 0 END AS signal
      |  FROM sigall
      |  UNION ALL
      |  -- z-decision on integer cents: dev²·19 > 80·(20·Σc² − (Σc)²)
      |  SELECT 'mean_reversion', symbol, bucket_ms, close,
      |         CASE WHEN rn < 20 THEN 0
      |              WHEN floor(close * 100 + 0.5) * 20 - s1c < 0
      |               AND (floor(close * 100 + 0.5) * 20 - s1c) * (floor(close * 100 + 0.5) * 20 - s1c) * 19
      |                 > 80 * (s2c * 20 - s1c * s1c) THEN 1
      |              WHEN floor(close * 100 + 0.5) * 20 - s1c > 0
      |               AND (floor(close * 100 + 0.5) * 20 - s1c) * (floor(close * 100 + 0.5) * 20 - s1c) * 19
      |                 > 80 * (s2c * 20 - s1c * s1c) THEN -1 ELSE 0 END
      |  FROM sigall
      |  UNION ALL
      |  SELECT 'momentum', symbol, bucket_ms, close,
      |         CASE WHEN rn <= 20 THEN 0
      |              WHEN close / lag20 - 1 > 0.02 THEN 1
      |              WHEN close / lag20 - 1 < -0.02 THEN -1 ELSE 0 END
      |  FROM sigall
      |),
      |bt0 AS (
      |  SELECT strategy, symbol, bucket_ms, close, signal,
      |         CAST(signal AS DOUBLE) AS position,
      |         CAST(signal AS DOUBLE) - coalesce(lag(CAST(signal AS DOUBLE)) OVER w, 0.0) AS trade,
      |         coalesce(close / lag(close) OVER w - 1, 0.0) AS returns,
      |         coalesce(lag(CAST(signal AS DOUBLE)) OVER w, 0.0)
      |           * coalesce(close / lag(close) OVER w - 1, 0.0) AS strategy_returns
      |  FROM stacked WINDOW w AS (PARTITION BY strategy, symbol ORDER BY bucket_ms)
      |),
      |bt1 AS (
      |  SELECT *, abs(trade) * 0.0015 AS costs,
      |         strategy_returns - abs(trade) * 0.0015 AS net_returns
      |  FROM bt0
      |),
      |bt AS (
      |  SELECT *,
      |         CAST(sum(CAST(floor(ln(1.0 + greatest(net_returns, -0.9999)) * 1e8 + 0.5) AS BIGINT)) OVER (
      |           PARTITION BY strategy, symbol ORDER BY bucket_ms
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e8 AS log_equity
      |  FROM bt1
      |),
      |wp AS (
      |  SELECT *,
      |         max(log_equity) OVER cum AS log_peak,
      |         exp(log_equity - max(log_equity) OVER cum) - 1 AS dd,
      |         lag(position) OVER (PARTITION BY strategy, symbol ORDER BY bucket_ms) AS prev_pos
      |  FROM bt WINDOW cum AS (PARTITION BY strategy, symbol ORDER BY bucket_ms
      |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |)""".stripMargin

  /** bt + running equity peak / drawdown / previous position. */
  lazy val WithPeakCte: String = MaCrossBacktestCte + WpTail

  /** The peak/drawdown/prev-pos CTE appended to any `bt` chain (final
    * CTE: wp) — shared by the raw chain and the composed market job.
    */
  lazy val WpTail: String = """,
      |wp AS (
      |  SELECT *,
      |         max(log_equity) OVER cum AS log_peak,
      |         exp(log_equity - max(log_equity) OVER cum) - 1 AS dd,
      |         lag(position) OVER (PARTITION BY symbol ORDER BY bucket_ms) AS prev_pos
      |  FROM bt WINDOW cum AS (PARTITION BY symbol ORDER BY bucket_ms
      |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |)""".stripMargin
}
