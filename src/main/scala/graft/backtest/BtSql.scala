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
    QueryPack.barsCteAt(sec) + """,
      |sig AS (
      |  SELECT symbol, bucket_ms, close,
      |         row_number() OVER w AS rn,
      |         avg(close) OVER (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS fast_ma,
      |         avg(close) OVER (w ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) AS slow_ma
      |  FROM bars WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ms)
      |),
      |sig2 AS (
      |  SELECT symbol, bucket_ms, close, rn,
      |         CASE WHEN rn >= 50 AND fast_ma > slow_ma THEN 1 ELSE 0 END AS signal
      |  FROM sig
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
      |         floor(sum(ln(1.0 + greatest(net_returns, -0.9999))) OVER (
      |           PARTITION BY symbol ORDER BY bucket_ms
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1e8 + 0.5) / 1e8 AS log_equity
      |  FROM bt1
      |)""".stripMargin

  /** 1-min ma-cross backtest chain. */
  val MaCrossBacktestCte: String = maCrossChain(60)

  /** bt + running equity peak / drawdown / previous position. */
  val WithPeakCte: String =
    MaCrossBacktestCte + """,
      |wp AS (
      |  SELECT *,
      |         max(log_equity) OVER cum AS log_peak,
      |         exp(log_equity - max(log_equity) OVER cum) - 1 AS dd,
      |         lag(position) OVER (PARTITION BY symbol ORDER BY bucket_ms) AS prev_pos
      |  FROM bt WINDOW cum AS (PARTITION BY symbol ORDER BY bucket_ms
      |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |)""".stripMargin
}
