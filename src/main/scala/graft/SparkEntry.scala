package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    graft.operators.BarsPack,
    graft.etl.EtlPack,
    graft.backtest.BacktestPack,
    graft.backtest.RiskPack,
    graft.backtest.PortfolioPack,
    graft.backtest.ExtrasPack,
    graft.backtest.MarketStatsPack,
    graft.operators.DerivativesPack,
    graft.operators.EventsPack,
    graft.operators.TpchPack,
    graft.operators.MicroPack,
    graft.operators.VolPack,
    graft.operators.IndicatorsPack,
    graft.operators.TextPack,
    graft.operators.AnnPack,
    graft.operators.DedupPack,
    graft.operators.CorpusPack,
    graft.operators.SpanPack,
    graft.operators.RetrievalPack,
    graft.sources.CorpusJob,
    graft.sources.MarketJob
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_ohlcv_1min")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** DuckDB-runnable oracle SQL per query (same column names + row order). */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
