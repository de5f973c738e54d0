package graft.operators

import graft.QueryPack
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Microstructure queries: information-driven bars, tick-rule order
  * flow, Roll implied spread. Reference family:
  * data_processing/tick_to_ohlcv.py, resampler.py (time bars — these
  * are their event-clock counterparts on the same tick feed).
  *
  * Oracle note: the mirrors run FLAT per-symbol windows; the engine runs
  * the two-level chunked forms (Micro.scala). All running measures are
  * exact integers, so hash equality IS the proof that the chunked
  * decomposition matches the sequential definition (§5).
  */
object MicroPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dollar_bars" -> ((s, d) =>
      Micro.thresholdBars(Micro.intTicks(s, d), "dollar_c", Micro.DollarBarCents)),
    "q_volume_bars" -> ((s, d) =>
      Micro.thresholdBars(Micro.intTicks(s, d), "vol", Micro.VolumeBarUnits)),
    "q_tick_rule_flow" -> ((s, d) => Micro.tickRuleFlow(s, d)),
    "q_roll_spread" -> ((s, d) => Micro.rollSpread(s, d))
  )

  /** Shared mirror CTE: integer tick measures (cents, volume units,
    * traded value) over the tick view.
    */
  private val MtCte: String =
    QueryPack.TicksCte + """,
      |mt AS (
      |  SELECT symbol, epoch_ns(ts) AS tsn, event_id, price,
      |         CAST(volume AS BIGINT) AS vol,
      |         CAST(floor(price * 100 + 0.5) AS BIGINT) AS cents,
      |         CAST(floor(price * 100 + 0.5) AS BIGINT) * CAST(volume AS BIGINT) AS dollar_c
      |  FROM ticks
      |)""".stripMargin

  private def barsSql(measure: String, threshold: Long): String =
    s"""WITH $MtCte,
       |c AS (
       |  SELECT *, coalesce(sum($measure) OVER (PARTITION BY symbol ORDER BY tsn, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
       |  FROM mt
       |)
       |SELECT symbol, CAST(cum_prev // $threshold AS BIGINT) AS bar_id,
       |       count(*) AS n_ticks,
       |       arg_min(price, tsn) AS open, max(price) AS high,
       |       min(price) AS low, arg_max(price, tsn) AS close,
       |       CAST(sum(vol) AS BIGINT) AS volume,
       |       CAST(sum(dollar_c) AS BIGINT) AS dollar_cents,
       |       min(tsn) AS ts_start, max(tsn) AS ts_end
       |FROM c GROUP BY symbol, bar_id ORDER BY symbol, bar_id""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_dollar_bars" -> barsSql("dollar_c", Micro.DollarBarCents),
    "q_volume_bars" -> barsSql("vol", Micro.VolumeBarUnits),
    "q_tick_rule_flow" ->
      s"""WITH $MtCte,
         |s1 AS (
         |  SELECT symbol, tsn, event_id, vol,
         |         cents - lag(cents) OVER (PARTITION BY symbol ORDER BY tsn, event_id) AS dpc
         |  FROM mt
         |),
         |s2 AS (
         |  SELECT *, CASE WHEN dpc > 0 THEN 1 WHEN dpc < 0 THEN -1 END AS raw_sign FROM s1
         |),
         |s3 AS (
         |  SELECT *, coalesce(last_value(raw_sign IGNORE NULLS) OVER (
         |    PARTITION BY symbol ORDER BY tsn, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 1) AS sign
         |  FROM s2
         |),
         |agg AS (
         |  SELECT symbol, tsn // 3600000000000 * 3600000 AS bucket_ms,
         |         CAST(sum(CASE WHEN sign = 1 THEN vol ELSE 0 END) AS BIGINT) AS buy_vol,
         |         CAST(sum(CASE WHEN sign = -1 THEN vol ELSE 0 END) AS BIGINT) AS sell_vol,
         |         count(*) AS n_ticks
         |  FROM s3 GROUP BY 1, 2
         |)
         |SELECT symbol, bucket_ms, buy_vol, sell_vol, n_ticks,
         |       CAST(buy_vol - sell_vol AS DOUBLE) / CAST(buy_vol + sell_vol AS DOUBLE) AS imbalance
         |FROM agg ORDER BY symbol, bucket_ms""".stripMargin,
    "q_roll_spread" ->
      s"""WITH $MtCte,
         |s1 AS (
         |  SELECT symbol, tsn, event_id,
         |         cents - lag(cents) OVER (PARTITION BY symbol ORDER BY tsn, event_id) AS dpc
         |  FROM mt
         |),
         |s2 AS (
         |  SELECT symbol, dpc,
         |         lead(dpc) OVER (PARTITION BY symbol ORDER BY tsn, event_id) AS dpn
         |  FROM s1
         |),
         |a AS (
         |  SELECT symbol, count(*) AS n_pairs,
         |         sum(dpc) AS sx, sum(dpn) AS sy, sum(dpc * dpn) AS sxy
         |  FROM s2 WHERE dpc IS NOT NULL AND dpn IS NOT NULL GROUP BY 1
         |),
         |b AS (
         |  SELECT symbol, n_pairs,
         |         CAST(n_pairs AS HUGEINT) * sxy - sx * sy AS num,
         |         CAST(n_pairs AS HUGEINT) * n_pairs AS den
         |  FROM a
         |),
         |cv AS (
         |  SELECT symbol, n_pairs,
         |         floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1e6 + 0.5) / 1e6 AS cov_cents2
         |  FROM b
         |)
         |SELECT symbol, n_pairs, cov_cents2,
         |       floor(2 * sqrt(greatest(-cov_cents2, 0)) * 1e6 + 0.5) / 1e6 AS roll_spread_cents
         |FROM cv ORDER BY symbol""".stripMargin
  )
}
