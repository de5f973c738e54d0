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
    // both bar clocks read the session-memoized cumulative frame (one
    // shared two-level window pass); values identical to the per-query
    // exclCum form — exact integers, same cum column
    "q_dollar_bars" -> ((s, d) =>
      Micro.thresholdBarsCached(s, d, "cum_dollar_prev", Micro.DollarBarCents)),
    "q_volume_bars" -> ((s, d) =>
      Micro.thresholdBarsCached(s, d, "cum_vol_prev", Micro.VolumeBarUnits)),
    "q_tick_rule_flow" -> ((s, d) => Micro.tickRuleFlow(s, d)),
    "q_roll_spread" -> ((s, d) => Micro.rollSpread(s, d)),
    "q_vpin" -> ((s, d) => Micro.vpin(s, d)),
    "q_return_acf" -> ((s, d) => Micro.returnAcf(s, d)),
    "q_kyle_lambda" -> ((s, d) => Micro.kyleLambda(s, d)),
    "q_variance_ratio" -> ((s, d) => Micro.varianceRatio(s, d)),
    "q_hawkes_intensity" -> ((s, d) => Micro.hawkesIntensity(s, d)),
    "q_price_impact_curve" -> ((s, d) => Micro.priceImpactCurve(s, d)),
    "q_effective_spread" -> ((s, d) => Micro.effectiveSpread(s, d)),
    // oracled via a per-symbol recursive CTE (the reset feedback is
    // genuinely sequential — the CTE advances every symbol one tick per
    // iteration); MicroSpec additionally pins it against an in-test
    // sequential fold
    "q_cusum_events" -> ((s, d) => Micro.cusumEvents(s, d))
  )

  /** Tick-rule sign chain shared by the flow and VPIN mirrors (lazy:
    * MtCte is declared below). Package-visible: IndicatorsPack's OBV
    * mirror consumes the same classified feed.
    */
  private[operators] lazy val SignCte: String =
    s"""$MtCte,
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
       |)""".stripMargin

  /** Shared mirror CTE: integer tick measures (cents, volume units,
    * traded value) over the tick view. Package-visible: VolPack's
    * mirrors start from the same integer tick frame.
    */
  private[operators] val MtCte: String =
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
    "q_effective_spread" ->
      s"""WITH ${QueryPack.TicksCte},
         |lq AS (
         |  SELECT symbol, epoch_ns(ts) AS tsn, arg_max(price, event_id) AS qp
         |  FROM ticks GROUP BY 1, 2
         |),
         |r AS (
         |  SELECT symbol, tsn + 1 AS avail,
         |         qp * 0.999 AS bid, qp * 1.001 AS ask
         |  FROM lq
         |),
         |t AS (SELECT symbol, epoch_ns(ts) AS tsn, event_id, price FROM ticks),
         |j AS (
         |  SELECT t.symbol, t.tsn, t.price, r.bid, r.ask
         |  FROM t ASOF LEFT JOIN r
         |    ON t.symbol = r.symbol AND t.tsn >= r.avail
         |),
         |e AS (
         |  SELECT symbol, tsn,
         |         CAST(floor(abs(price - (bid + ask) / 2) / ((bid + ask) / 2)
         |           * 1e4 * 1e6 + 0.5) AS BIGINT) AS eff_u,
         |         CASE WHEN price > (bid + ask) / 2 THEN 1 ELSE 0 END AS buy
         |  FROM j WHERE bid IS NOT NULL
         |)
         |SELECT symbol, tsn // 3600000000000 * 3600000 AS bucket_ms,
         |       count(*) AS n_trades,
         |       CAST(sum(eff_u) AS DOUBLE) / (count(*) * 1e6) AS avg_eff_bps,
         |       ${graft.functions.Port.rsql(
                   "CAST(sum(buy) AS DOUBLE) / count(*)", 6)} AS buy_frac
         |FROM e GROUP BY 1, 2 ORDER BY symbol, bucket_ms""".stripMargin,
    // the CUSUM reset recursion is sequential by definition, so the
    // mirror IS a recursion: a recursive CTE whose working table holds
    // one (symbol, state) row per symbol and advances every symbol one
    // tick per iteration. MATERIALIZED on the diff CTE is load-bearing:
    // without it DuckDB re-evaluates the window per iteration (~40x).
    "q_cusum_events" ->
      """WITH RECURSIVE
        |t AS MATERIALIZED (
        |  SELECT event_type AS symbol, epoch_ns(ts) AS ts, event_id,
        |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
        |         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
        |  FROM events
        |),
        |d AS MATERIALIZED (
        |  SELECT symbol, ts, event_id, rn,
        |         cents - lag(cents) OVER (PARTITION BY symbol ORDER BY rn) AS dpc
        |  FROM t
        |),
        |rec AS (
        |  SELECT symbol, 1 AS rn, CAST(0 AS BIGINT) AS sp, CAST(0 AS BIGINT) AS sm,
        |         CAST(0 AS BIGINT) AS n, CAST(NULL AS BIGINT) AS ts,
        |         CAST(NULL AS BIGINT) AS event_id, 0 AS direction,
        |         CAST(NULL AS BIGINT) AS s_cents, CAST(NULL AS BIGINT) AS n_ticks
        |  FROM (SELECT DISTINCT symbol FROM t)
        |  UNION ALL
        |  SELECT symbol, rn,
        |         CASE WHEN sp2 >= 20 OR sm2 <= -20 THEN 0 ELSE sp2 END AS sp,
        |         CASE WHEN sp2 >= 20 OR sm2 <= -20 THEN 0 ELSE sm2 END AS sm,
        |         CASE WHEN sp2 >= 20 OR sm2 <= -20 THEN 0 ELSE n2 END AS n,
        |         ts, event_id,
        |         CASE WHEN sp2 >= 20 THEN 1 WHEN sm2 <= -20 THEN -1 ELSE 0 END AS direction,
        |         CASE WHEN sp2 >= 20 THEN sp2 WHEN sm2 <= -20 THEN sm2 ELSE NULL END AS s_cents,
        |         CASE WHEN sp2 >= 20 OR sm2 <= -20 THEN n2 ELSE NULL END AS n_ticks
        |  FROM (
        |    SELECT d.symbol, d.rn, greatest(0, rec.sp + d.dpc) AS sp2,
        |           least(0, rec.sm + d.dpc) AS sm2, rec.n + 1 AS n2, d.ts, d.event_id
        |    FROM rec JOIN d ON d.symbol = rec.symbol AND d.rn = rec.rn + 1
        |  )
        |)
        |SELECT symbol, ts, event_id, direction, s_cents, n_ticks
        |FROM rec WHERE direction <> 0 ORDER BY symbol, ts, event_id""".stripMargin,
    "q_dollar_bars" -> barsSql("dollar_c", Micro.DollarBarCents),
    "q_volume_bars" -> barsSql("vol", Micro.VolumeBarUnits),
    "q_tick_rule_flow" ->
      s"""WITH $SignCte,
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
    "q_vpin" ->
      s"""WITH $SignCte,
         |c AS (
         |  SELECT *, coalesce(sum(vol) OVER (PARTITION BY symbol ORDER BY tsn, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
         |  FROM s3
         |),
         |b AS (
         |  SELECT symbol, CAST(cum_prev // ${Micro.VolumeBarUnits} AS BIGINT) AS bucket_id,
         |         CAST(sum(CASE WHEN sign = 1 THEN vol ELSE 0 END) AS BIGINT) AS buy_vol,
         |         CAST(sum(CASE WHEN sign = -1 THEN vol ELSE 0 END) AS BIGINT) AS sell_vol,
         |         min(tsn) AS ts_start, max(tsn) AS ts_end
         |  FROM c GROUP BY 1, 2
         |),
         |m AS (
         |  SELECT *, CAST(floor(CAST(abs(buy_vol - sell_vol) AS DOUBLE)
         |    / CAST(buy_vol + sell_vol AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS imb_micro
         |  FROM b
         |),
         |w AS (
         |  SELECT *, count(*) OVER wd AS n_win, sum(imb_micro) OVER wd AS s_micro
         |  FROM m WINDOW wd AS (PARTITION BY symbol ORDER BY bucket_id
         |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
         |)
         |SELECT symbol, bucket_id, buy_vol, sell_vol, ts_start, ts_end,
         |       imb_micro / 1e6 AS imbalance,
         |       CAST(s_micro AS DOUBLE) / (n_win * 1e6) AS vpin
         |FROM w ORDER BY symbol, bucket_id""".stripMargin,
    "q_return_acf" ->
      s"""WITH ${graft.QueryPack.BarsCte},
         |d0 AS (
         |  SELECT symbol, bucket_ms,
         |         CAST(floor(close * 100 + 0.5) AS BIGINT) AS cents
         |  FROM bars
         |),
         |d1 AS (
         |  SELECT symbol, bucket_ms,
         |         cents - lag(cents) OVER (PARTITION BY symbol ORDER BY bucket_ms) AS x
         |  FROM d0
         |),
         |d2 AS (SELECT symbol, bucket_ms, x FROM d1 WHERE x IS NOT NULL),
         |lagged AS (
         |  SELECT symbol, x,
         |         lag(x, 1) OVER w AS y1, lag(x, 2) OVER w AS y2,
         |         lag(x, 3) OVER w AS y3, lag(x, 4) OVER w AS y4,
         |         lag(x, 5) OVER w AS y5
         |  FROM d2 WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ms)
         |),
         |pairs AS (
         |  SELECT symbol, CAST(l.lag AS BIGINT) AS lag, x,
         |         CASE l.lag WHEN 1 THEN y1 WHEN 2 THEN y2 WHEN 3 THEN y3
         |                    WHEN 4 THEN y4 WHEN 5 THEN y5 END AS y
         |  FROM lagged CROSS JOIN (SELECT unnest([1, 2, 3, 4, 5]) AS lag) l
         |),
         |a AS (
         |  SELECT symbol, lag, count(*) AS n_pairs,
         |         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         |         sum(x * x) AS sxx, sum(y * y) AS syy
         |  FROM pairs WHERE y IS NOT NULL GROUP BY 1, 2
         |),
         |b AS (
         |  SELECT symbol, lag, n_pairs,
         |         CAST(n_pairs AS HUGEINT) * sxy - sx * sy AS num,
         |         CAST(n_pairs AS HUGEINT) * sxx - sx * sx AS dxx,
         |         CAST(n_pairs AS HUGEINT) * syy - sy * sy AS dyy
         |  FROM a
         |)
         |SELECT symbol, lag, n_pairs,
         |       CASE WHEN dxx = 0 OR dyy = 0 THEN 0.0
         |            ELSE floor(CAST(num AS DOUBLE)
         |              / sqrt(CAST(dxx AS DOUBLE) * CAST(dyy AS DOUBLE))
         |              * 1e6 + 0.5) / 1e6
         |       END AS acf
         |FROM b ORDER BY symbol, lag""".stripMargin,
    "q_hawkes_intensity" -> {
      val taps = 20
      val lags = (1 to taps).map(k =>
        s"lag(tsn, $k) OVER w AS t$k").mkString(",\n         |         ")
      val terms = (1 to taps).map(k =>
        s"coalesce(CAST(floor(exp(CAST(t$k - tsn AS DOUBLE) / 3e10) * 1e6 + 0.5) AS BIGINT), 0)")
        .mkString(" + ")
      val contrib = (1 to taps).map(k =>
        s"CASE WHEN t$k IS NULL THEN 0 ELSE 1 END").mkString(" + ")
      s"""WITH $MtCte,
         |l AS (
         |  SELECT symbol, tsn, event_id,
         |         $lags
         |  FROM mt WINDOW w AS (PARTITION BY symbol, tsn // 86400000000000
         |    ORDER BY tsn, event_id)
         |),
         |t AS (
         |  SELECT symbol, tsn AS ts, event_id,
         |         CAST($contrib AS BIGINT) AS n_contrib,
         |         CAST($terms AS BIGINT) AS s_u
         |  FROM l
         |)
         |SELECT symbol, ts, event_id, n_contrib,
         |       floor((0.1 + 0.5 * (CAST(s_u AS DOUBLE) / 1e6)) * 1e6 + 0.5) / 1e6
         |         AS intensity
         |FROM t ORDER BY symbol, ts, event_id""".stripMargin
    },
    "q_price_impact_curve" ->
      s"""WITH $MtCte,
         |s1 AS (
         |  SELECT symbol, vol,
         |         cents - lag(cents) OVER (PARTITION BY symbol
         |           ORDER BY tsn, event_id) AS dpc
         |  FROM mt
         |),
         |a AS (
         |  SELECT symbol, (vol - 1) // 10 AS size_bucket,
         |         count(*) AS n_ticks,
         |         CAST(sum(vol) AS BIGINT) AS total_vol,
         |         CAST(sum(abs(dpc)) AS BIGINT) AS s_abs
         |  FROM s1 WHERE dpc IS NOT NULL GROUP BY 1, 2
         |)
         |SELECT symbol, size_bucket, n_ticks, total_vol,
         |       CAST(s_abs AS DOUBLE) / CAST(n_ticks AS DOUBLE) AS avg_abs_move_cents
         |FROM a ORDER BY symbol, size_bucket""".stripMargin,
    "q_kyle_lambda" ->
      s"""WITH $SignCte,
         |p AS (
         |  SELECT symbol, sign * vol AS x, dpc FROM s3 WHERE dpc IS NOT NULL
         |),
         |a AS (
         |  SELECT symbol, count(*) AS n_ticks,
         |         sum(x) AS sx, sum(dpc) AS sy, sum(x * dpc) AS sxy,
         |         sum(x * x) AS sxx, sum(dpc * dpc) AS syy
         |  FROM p GROUP BY 1
         |),
         |b AS (
         |  SELECT symbol, n_ticks,
         |         CAST(n_ticks AS HUGEINT) * sxy - sx * sy AS num,
         |         CAST(n_ticks AS HUGEINT) * sxx - sx * sx AS dxx,
         |         CAST(n_ticks AS HUGEINT) * syy - sy * sy AS dyy
         |  FROM a
         |)
         |SELECT symbol, n_ticks,
         |       CASE WHEN dxx = 0 THEN 0.0
         |            ELSE floor(CAST(num AS DOUBLE) / CAST(dxx AS DOUBLE) * 1e8 + 0.5) / 1e8
         |       END AS kyle_lambda,
         |       CASE WHEN dxx = 0 OR dyy = 0 THEN 0.0
         |            ELSE floor((CAST(num AS DOUBLE) * CAST(num AS DOUBLE))
         |              / (CAST(dxx AS DOUBLE) * CAST(dyy AS DOUBLE)) * 1e6 + 0.5) / 1e6
         |       END AS r2
         |FROM b ORDER BY symbol""".stripMargin,
    "q_variance_ratio" ->
      s"""WITH ${graft.QueryPack.BarsCte},
         |d0 AS (
         |  SELECT symbol, bucket_ms,
         |         CAST(floor(close * 100 + 0.5) AS BIGINT) AS cents
         |  FROM bars
         |),
         |lagged AS (
         |  SELECT symbol,
         |         cents - lag(cents, 1) OVER w AS d1,
         |         cents - lag(cents, 2) OVER w AS d2,
         |         cents - lag(cents, 5) OVER w AS d5,
         |         cents - lag(cents, 10) OVER w AS d10
         |  FROM d0 WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ms)
         |),
         |st AS (
         |  SELECT symbol, CAST(l.q AS BIGINT) AS q,
         |         CASE l.q WHEN 1 THEN d1 WHEN 2 THEN d2
         |                  WHEN 5 THEN d5 WHEN 10 THEN d10 END AS y
         |  FROM lagged CROSS JOIN (SELECT unnest([1, 2, 5, 10]) AS q) l
         |),
         |m AS (
         |  SELECT symbol, q, count(*) AS n_periods,
         |         sum(y) AS sy, sum(y * y) AS syy
         |  FROM st WHERE y IS NOT NULL GROUP BY 1, 2
         |),
         |v AS (
         |  SELECT symbol, q, n_periods,
         |         CAST(CAST(n_periods AS HUGEINT) * syy - sy * sy AS DOUBLE)
         |           / CAST(CAST(n_periods AS HUGEINT) * n_periods AS DOUBLE) AS variance
         |  FROM m
         |)
         |SELECT v.symbol, v.q, v.n_periods,
         |       floor(v.variance / (v.q * b.var1) * 1e6 + 0.5) / 1e6 AS vr
         |FROM v JOIN (SELECT symbol, variance AS var1 FROM v WHERE q = 1) b
         |  ON v.symbol = b.symbol
         |WHERE v.q <> 1
         |ORDER BY v.symbol, v.q""".stripMargin,
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
