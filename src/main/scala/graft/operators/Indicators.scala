package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic technical indicators beyond the reference's RSI/MACD/
  * Bollinger set (backtesting/ml_strategy.py:146-175): on-balance
  * volume over the tick-rule-classified feed, Wilder's average true
  * range, and the stochastic oscillator %K/%D. Same signal-engineering
  * family as q_ml_features / q_ema_macd; all three are downstream
  * inputs a strategy layer consumes like the reference's feature
  * frame.
  *
  * Portability posture: every running quantity is an exact integer
  * (signed volume units, cent ranges) or snaps to integer micro-units
  * BEFORE any window sum (the windowed-float-sum rule — DuckDB sums
  * window frames through a segment tree, Spark in frame order, so
  * only integer window sums are engine-portable). Ratios are one IEEE
  * division of exact integers.
  */
object Indicators {

  /** On-balance volume, tick-level: OBV_t = Σ_{i≤t} sign_i·vol_i over
    * the tick-rule-classified feed (q_tick_rule_flow's sign), sampled
    * at the last tick of each (symbol, hour). The running sum is the
    * same two-level exact-integer cumsum the threshold bars use
    * (intra-day windows + broadcast chunk offsets), so no symbol's
    * full history ever sorts in one task; rides the session-memoized
    * signed-tick frame.
    */
  def obv(s: SparkSession, d: String, chunkNs: Long = Micro.ChunkNs): DataFrame =
    Micro.exclCum(
      Micro.signedTicksCached(s, d, chunkNs)
        .withColumn("sv", col("sign").cast("long") * col("vol")),
      "sv", chunkNs)
      .withColumn("obv_t", col("cum_prev") + col("sv"))
      .groupBy(col("symbol"),
        expr("ts div 3600000000000 * 3600000").as("bucket_ms"))
      .agg(expr("max_by(obv_t, ts)").as("obv"), count(lit(1)).as("n_ticks"))
      .orderBy("symbol", "bucket_ms")

  /** Average true range over minute bars: TR = max(high−low,
    * |high−prev close|, |low−prev close|) in exact cents (bars with no
    * predecessor are excluded so no engine-specific null-in-greatest
    * semantics apply); ATR(14) = trailing mean = one division of the
    * exact integer window sum by the window count.
    */
  def atr(s: SparkSession, d: String, window: Int = 14): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("bucket_ms")
    val wT = w.rowsBetween(-(window - 1), 0)
    Bars.ohlcvCached(s, d, 60)
      .select(col("symbol"), col("bucket_ms"),
        floor(col("high") * 100 + lit(0.5)).cast("long").as("h"),
        floor(col("low") * 100 + lit(0.5)).cast("long").as("l"),
        floor(col("close") * 100 + lit(0.5)).cast("long").as("c"))
      .withColumn("pc", lag("c", 1).over(w))
      .filter(col("pc").isNotNull)
      .withColumn("tr_cents",
        greatest(col("h") - col("l"), abs(col("h") - col("pc")),
          abs(col("l") - col("pc"))))
      .withColumn("atr_cents",
        sum(col("tr_cents")).over(wT).cast("double") /
          count(lit(1)).over(wT).cast("double"))
      .select("symbol", "bucket_ms", "tr_cents", "atr_cents")
      .orderBy("symbol", "bucket_ms")
  }

  /** Stochastic oscillator over minute bars: %K = 100·(close −
    * min low₁₄)/(max high₁₄ − min low₁₄) — numerator and denominator
    * exact cent integers, one division; flat-range bars pin %K = 50.
    * %K snaps to integer micro-units before %D's trailing-3 window
    * sum (the portability rule), %D = exact sum / (n·1e6).
    */
  def stochastic(s: SparkSession, d: String,
                 kWindow: Int = 14, dWindow: Int = 3): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("bucket_ms")
    val wK = w.rowsBetween(-(kWindow - 1), 0)
    val wD = w.rowsBetween(-(dWindow - 1), 0)
    Bars.ohlcvCached(s, d, 60)
      .select(col("symbol"), col("bucket_ms"),
        floor(col("high") * 100 + lit(0.5)).cast("long").as("h"),
        floor(col("low") * 100 + lit(0.5)).cast("long").as("l"),
        floor(col("close") * 100 + lit(0.5)).cast("long").as("c"))
      .withColumn("minl", min("l").over(wK))
      .withColumn("maxh", max("h").over(wK))
      .withColumn("k_u",
        when(col("maxh") === col("minl"), lit(50000000L)).otherwise(
          floor((col("c") - col("minl")).cast("double") * 100 /
            (col("maxh") - col("minl")).cast("double") * 1e6 + lit(0.5))
            .cast("long")))
      .withColumn("pct_k", col("k_u") / 1e6)
      .withColumn("pct_d",
        sum(col("k_u")).over(wD).cast("double") /
          (count(lit(1)).over(wD) * 1e6))
      .select("symbol", "bucket_ms", "pct_k", "pct_d")
      .orderBy("symbol", "bucket_ms")
  }
}

/** Pack registration + DuckDB mirrors for the indicator family. */
object IndicatorsPack extends graft.QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_obv" -> ((s, d) => Indicators.obv(s, d)),
    "q_atr" -> ((s, d) => Indicators.atr(s, d)),
    "q_stochastic" -> ((s, d) => Indicators.stochastic(s, d))
  )

  def oracles: Map[String, String] = Map(
    "q_obv" ->
      s"""WITH ${MicroPack.SignCte},
         |c AS (
         |  SELECT symbol, tsn, sum(vol * sign) OVER (
         |    PARTITION BY symbol ORDER BY tsn, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS obv_t
         |  FROM s3
         |)
         |SELECT symbol, tsn // 3600000000000 * 3600000 AS bucket_ms,
         |       CAST(arg_max(obv_t, tsn) AS BIGINT) AS obv,
         |       count(*) AS n_ticks
         |FROM c GROUP BY 1, 2 ORDER BY symbol, bucket_ms""".stripMargin,
    "q_atr" ->
      s"""WITH ${graft.QueryPack.BarsCte},
         |b0 AS (
         |  SELECT symbol, bucket_ms,
         |         CAST(floor(high * 100 + 0.5) AS BIGINT) AS h,
         |         CAST(floor(low * 100 + 0.5) AS BIGINT) AS l,
         |         CAST(floor(close * 100 + 0.5) AS BIGINT) AS c
         |  FROM bars
         |),
         |b1 AS (
         |  SELECT *, lag(c) OVER (PARTITION BY symbol ORDER BY bucket_ms) AS pc
         |  FROM b0
         |),
         |b2 AS (
         |  SELECT symbol, bucket_ms,
         |         greatest(h - l, abs(h - pc), abs(l - pc)) AS tr_cents
         |  FROM b1 WHERE pc IS NOT NULL
         |),
         |b3 AS (
         |  SELECT symbol, bucket_ms, tr_cents,
         |         sum(tr_cents) OVER wt AS s_tr, count(*) OVER wt AS n_win
         |  FROM b2 WINDOW wt AS (PARTITION BY symbol ORDER BY bucket_ms
         |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
         |)
         |SELECT symbol, bucket_ms, tr_cents,
         |       CAST(s_tr AS DOUBLE) / CAST(n_win AS DOUBLE) AS atr_cents
         |FROM b3 ORDER BY symbol, bucket_ms""".stripMargin,
    "q_stochastic" ->
      s"""WITH ${graft.QueryPack.BarsCte},
         |b0 AS (
         |  SELECT symbol, bucket_ms,
         |         CAST(floor(high * 100 + 0.5) AS BIGINT) AS h,
         |         CAST(floor(low * 100 + 0.5) AS BIGINT) AS l,
         |         CAST(floor(close * 100 + 0.5) AS BIGINT) AS c
         |  FROM bars
         |),
         |b1 AS (
         |  SELECT symbol, bucket_ms, c,
         |         min(l) OVER wk AS minl, max(h) OVER wk AS maxh
         |  FROM b0 WINDOW wk AS (PARTITION BY symbol ORDER BY bucket_ms
         |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
         |),
         |b2 AS (
         |  SELECT symbol, bucket_ms,
         |         CASE WHEN maxh = minl THEN 50000000 ELSE
         |           CAST(floor(CAST(c - minl AS DOUBLE) * 100
         |             / CAST(maxh - minl AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
         |         END AS k_u
         |  FROM b1
         |),
         |b3 AS (
         |  SELECT symbol, bucket_ms, k_u,
         |         sum(k_u) OVER wd AS s_k, count(*) OVER wd AS n_win
         |  FROM b2 WINDOW wd AS (PARTITION BY symbol ORDER BY bucket_ms
         |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         |)
         |SELECT symbol, bucket_ms, k_u / 1e6 AS pct_k,
         |       CAST(s_k AS DOUBLE) / (n_win * 1e6) AS pct_d
         |FROM b3 ORDER BY symbol, bucket_ms""".stripMargin
  )
}
