package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Resampling queries: tick→OHLCV, OHLCV downsample, VWAP.
  * Reference: data_processing/tick_to_ohlcv.py, data_processing/resampler.py.
  */
object BarsPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ohlcv_1min" -> ((s, d) =>
      Bars.ohlcvCached(s, d, 60).orderBy("symbol", "bucket_ms")),
    "q_ohlcv_downsample_5min" -> ((s, d) =>
      Bars.downsample(Bars.ohlcvCached(s, d, 60), 300)
        .orderBy("symbol", "bucket_ms")),
    "q_vwap_hourly" -> ((s, d) =>
      Bars.vwapHourly(Tables.ticks(s, d)).orderBy("symbol", "bucket_ms"))
  )

  def oracles: Map[String, String] = Map(
    "q_ohlcv_1min" ->
      s"""WITH ${QueryPack.BarsCte}
         |SELECT * FROM bars ORDER BY symbol, bucket_ms""".stripMargin,
    "q_ohlcv_downsample_5min" ->
      s"""WITH ${QueryPack.BarsCte}
         |SELECT symbol,
         |       bucket_ms // 300000 * 300000 AS bucket_ms,
         |       arg_min(open, bucket_ms) AS open,
         |       max(high) AS high,
         |       min(low) AS low,
         |       arg_max(close, bucket_ms) AS close,
         |       sum(volume) AS volume
         |FROM bars GROUP BY symbol, 2 ORDER BY symbol, bucket_ms""".stripMargin,
    "q_vwap_hourly" ->
      s"""WITH ${QueryPack.TicksCte}
         |SELECT symbol,
         |       epoch_ns(ts) // 3600000000000 * 3600000 AS bucket_ms,
         |       floor(floor(sum(price * volume) * 1e2 + 0.5) / 1e2 / sum(volume) * 1e4 + 0.5) / 1e4 AS vwap,
         |       sum(volume) AS volume,
         |       count(*) AS n_trades
         |FROM ticks GROUP BY symbol, 2 ORDER BY symbol, bucket_ms""".stripMargin
  )
}
