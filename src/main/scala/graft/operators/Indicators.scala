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
    Micro.cumTicksCached(s, d, chunkNs)
      .withColumn("obv_t", col("cum_sv_prev") + col("sv"))
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

  /** Williams %R over minute bars — the stochastic's mirror image:
    * %R = −100·(max high₁₄ − close)/(max high₁₄ − min low₁₄), exact
    * cent integers, one snapped division; flat ranges pin −50.
    */
  def williamsR(s: SparkSession, d: String, window: Int = 14): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("bucket_ms")
      .rowsBetween(-(window - 1), 0)
    Bars.ohlcvCached(s, d, 60)
      .select(col("symbol"), col("bucket_ms"),
        floor(col("high") * 100 + lit(0.5)).cast("long").as("h"),
        floor(col("low") * 100 + lit(0.5)).cast("long").as("l"),
        floor(col("close") * 100 + lit(0.5)).cast("long").as("c"))
      .withColumn("minl", min("l").over(w))
      .withColumn("maxh", max("h").over(w))
      .withColumn("r_u",
        when(col("maxh") === col("minl"), lit(50000000L)).otherwise(
          floor((col("maxh") - col("c")).cast("double") * 100 /
            (col("maxh") - col("minl")).cast("double") * 1e6 + lit(0.5))
            .cast("long")))
      .withColumn("pct_r", -(col("r_u") / 1e6))
      .select("symbol", "bucket_ms", "pct_r")
      .orderBy("symbol", "bucket_ms")
  }

  /** Donchian channel over minute bars, lookback EXCLUDING the current
    * bar (the breakout definition: close crossing the prior-N channel).
    * Upper/lower are exact cent extremes; width is one division of
    * exact integers ((u−l)·20000/(u+l) ≡ (u−l)/mid in bps), snapped;
    * rows without a full lookback are excluded so partial-window
    * channels never emit.
    */
  def donchian(s: SparkSession, d: String, window: Int = 20): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("bucket_ms")
      .rowsBetween(-window, -1)
    Bars.ohlcvCached(s, d, 60)
      .select(col("symbol"), col("bucket_ms"),
        floor(col("high") * 100 + lit(0.5)).cast("long").as("h"),
        floor(col("low") * 100 + lit(0.5)).cast("long").as("l"),
        floor(col("close") * 100 + lit(0.5)).cast("long").as("c"))
      .withColumn("u_c", max("h").over(w))
      .withColumn("l_c", min("l").over(w))
      .withColumn("n_win", count(lit(1)).over(w))
      .filter(col("n_win") === window)
      .select(col("symbol"), col("bucket_ms"),
        (col("u_c") / 100.0).as("chan_upper"),
        (col("l_c") / 100.0).as("chan_lower"),
        ((col("u_c") + col("l_c")) / 200.0).as("chan_mid"),
        graft.functions.Port.r(
          (col("u_c") - col("l_c")).cast("double") * 20000 /
            (col("u_c") + col("l_c")).cast("double"), 6).as("width_bps"),
        (when(col("c") > col("u_c"), 1)
          .when(col("c") < col("l_c"), -1).otherwise(0)).cast("long").as("breakout"))
      .orderBy("symbol", "bucket_ms")
  }

  /** Candlestick pattern flags on minute bars — every rule is a pure
    * integer comparison on exact cents (no float enters any predicate,
    * so the flags are engine-exact by construction):
    * doji (10·|c−o| ≤ h−l on a non-flat bar), hammer (lower shadow ≥
    * 2·body, upper shadow ≤ body, non-zero body), and bullish/bearish
    * engulfing vs the previous bar's body. Emits EVERY bar with its
    * flag vector (a signal layer filters; the full frame keeps the
    * driver's rows>0 contract meaningful at any scale factor, where a
    * sparse matched-only stream can be legitimately empty).
    */
  def candlePatterns(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("bucket_ms")
    Bars.ohlcvCached(s, d, 60)
      .select(col("symbol"), col("bucket_ms"),
        floor(col("open") * 100 + lit(0.5)).cast("long").as("o"),
        floor(col("high") * 100 + lit(0.5)).cast("long").as("h"),
        floor(col("low") * 100 + lit(0.5)).cast("long").as("l"),
        floor(col("close") * 100 + lit(0.5)).cast("long").as("c"))
      .withColumn("po", lag("o", 1).over(w))
      .withColumn("pc", lag("c", 1).over(w))
      .withColumn("body", abs(col("c") - col("o")))
      .withColumn("doji",
        (lit(10) * col("body") <= col("h") - col("l") &&
          col("h") > col("l")).cast("long"))
      .withColumn("hammer",
        (col("body") > 0 &&
          least(col("o"), col("c")) - col("l") >= lit(2) * col("body") &&
          col("h") - greatest(col("o"), col("c")) <= col("body")).cast("long"))
      .withColumn("bull_engulf",
        coalesce(
          (col("pc") < col("po") && col("c") > col("o") &&
            col("o") <= col("pc") && col("c") >= col("po")).cast("long"),
          lit(0L)))
      .withColumn("bear_engulf",
        coalesce(
          (col("pc") > col("po") && col("c") < col("o") &&
            col("o") >= col("pc") && col("c") <= col("po")).cast("long"),
          lit(0L)))
      .select("symbol", "bucket_ms", "doji", "hammer", "bull_engulf", "bear_engulf")
      .orderBy("symbol", "bucket_ms")
  }

  /** Classic floor-trader pivot points from the PREVIOUS day's daily
    * bar: P=(H+L+C)/3, R1=2P−L, S1=2P−H, R2=P+(H−L), S2=P−(H−L). All
    * levels are computed in thirds-of-cents integers (T = h+l+c cents,
    * so 300·P = 3·T etc.) and divided by 300 exactly once — one IEEE
    * division of an exact integer per level, engine-portable with no
    * snapping. `close_vs_pivot` compares 3·close against T exactly.
    */
  def pivotPoints(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("bucket_ms")
    Bars.ohlcvCached(s, d, 86400)
      .select(col("symbol"), col("bucket_ms"),
        floor(col("high") * 100 + lit(0.5)).cast("long").as("h"),
        floor(col("low") * 100 + lit(0.5)).cast("long").as("l"),
        floor(col("close") * 100 + lit(0.5)).cast("long").as("c"))
      .withColumn("ph", lag("h", 1).over(w))
      .withColumn("pl", lag("l", 1).over(w))
      .withColumn("pc", lag("c", 1).over(w))
      .filter(col("pc").isNotNull)
      .withColumn("t3", col("ph") + col("pl") + col("pc"))
      .select(col("symbol"), col("bucket_ms"),
        (col("t3") / 300.0).as("pivot"),
        ((lit(2) * col("t3") - lit(3) * col("pl")) / 300.0).as("r1"),
        ((lit(2) * col("t3") - lit(3) * col("ph")) / 300.0).as("s1"),
        ((col("t3") + lit(3) * (col("ph") - col("pl"))) / 300.0).as("r2"),
        ((col("t3") - lit(3) * (col("ph") - col("pl"))) / 300.0).as("s2"),
        (when(lit(3) * col("c") > col("t3"), 1)
          .when(lit(3) * col("c") < col("t3"), -1).otherwise(0))
          .cast("long").as("close_vs_pivot"))
      .orderBy("symbol", "bucket_ms")
  }

  /** Overnight-gap analysis over daily bars: gap = open − previous
    * close in exact cents, gap size one exact-integer division (bps of
    * the previous close), and the classic fill test — a gap-up day
    * fills when its low trades back to the previous close, a gap-down
    * day when its high does.
    */
  def gapAnalysis(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("bucket_ms")
    Bars.ohlcvCached(s, d, 86400)
      .select(col("symbol"), col("bucket_ms"),
        floor(col("open") * 100 + lit(0.5)).cast("long").as("o"),
        floor(col("high") * 100 + lit(0.5)).cast("long").as("h"),
        floor(col("low") * 100 + lit(0.5)).cast("long").as("l"),
        floor(col("close") * 100 + lit(0.5)).cast("long").as("c"))
      .withColumn("pc", lag("c", 1).over(w))
      .filter(col("pc").isNotNull)
      .withColumn("gap_cents", col("o") - col("pc"))
      .select(col("symbol"), col("bucket_ms"), col("gap_cents"),
        graft.functions.Port.r(
          col("gap_cents").cast("double") * 10000 / col("pc").cast("double"), 6)
          .as("gap_bps"),
        (when(col("gap_cents") > 0 && col("l") <= col("pc"), 1)
          .when(col("gap_cents") < 0 && col("h") >= col("pc"), 1)
          .otherwise(0)).cast("long").as("filled"),
        (when(col("gap_cents") > 0, 1).when(col("gap_cents") < 0, -1)
          .otherwise(0)).cast("long").as("direction"))
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
    "q_stochastic" -> ((s, d) => Indicators.stochastic(s, d)),
    "q_williams_r" -> ((s, d) => Indicators.williamsR(s, d)),
    "q_donchian" -> ((s, d) => Indicators.donchian(s, d)),
    "q_pivot_points" -> ((s, d) => Indicators.pivotPoints(s, d)),
    "q_gap_analysis" -> ((s, d) => Indicators.gapAnalysis(s, d)),
    "q_candle_patterns" -> ((s, d) => Indicators.candlePatterns(s, d))
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
    "q_candle_patterns" ->
      s"""WITH ${graft.QueryPack.BarsCte},
         |b0 AS (
         |  SELECT symbol, bucket_ms,
         |         CAST(floor(open * 100 + 0.5) AS BIGINT) AS o,
         |         CAST(floor(high * 100 + 0.5) AS BIGINT) AS h,
         |         CAST(floor(low * 100 + 0.5) AS BIGINT) AS l,
         |         CAST(floor(close * 100 + 0.5) AS BIGINT) AS c
         |  FROM bars
         |),
         |b1 AS (
         |  SELECT *, abs(c - o) AS body,
         |         lag(o) OVER ws AS po, lag(c) OVER ws AS pc
         |  FROM b0 WINDOW ws AS (PARTITION BY symbol ORDER BY bucket_ms)
         |),
         |b2 AS (
         |  SELECT symbol, bucket_ms,
         |         CAST(10 * body <= h - l AND h > l AS BIGINT) AS doji,
         |         CAST(body > 0 AND least(o, c) - l >= 2 * body
         |              AND h - greatest(o, c) <= body AS BIGINT) AS hammer,
         |         CAST(coalesce(pc < po AND c > o AND o <= pc AND c >= po,
         |              false) AS BIGINT) AS bull_engulf,
         |         CAST(coalesce(pc > po AND c < o AND o >= pc AND c <= po,
         |              false) AS BIGINT) AS bear_engulf
         |  FROM b1
         |)
         |SELECT * FROM b2
         |ORDER BY symbol, bucket_ms""".stripMargin,
    "q_williams_r" ->
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
         |)
         |SELECT symbol, bucket_ms,
         |       -(CASE WHEN maxh = minl THEN 50000000 ELSE
         |           CAST(floor(CAST(maxh - c AS DOUBLE) * 100
         |             / CAST(maxh - minl AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
         |         END / 1e6) AS pct_r
         |FROM b1 ORDER BY symbol, bucket_ms""".stripMargin,
    "q_donchian" ->
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
         |         max(h) OVER wd AS u_c, min(l) OVER wd AS l_c,
         |         count(*) OVER wd AS n_win
         |  FROM b0 WINDOW wd AS (PARTITION BY symbol ORDER BY bucket_ms
         |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
         |)
         |SELECT symbol, bucket_ms,
         |       u_c / 100.0 AS chan_upper, l_c / 100.0 AS chan_lower,
         |       (u_c + l_c) / 200.0 AS chan_mid,
         |       ${graft.functions.Port.rsql(
                   "CAST(u_c - l_c AS DOUBLE) * 20000 / CAST(u_c + l_c AS DOUBLE)", 6)}
         |         AS width_bps,
         |       CAST(CASE WHEN c > u_c THEN 1 WHEN c < l_c THEN -1 ELSE 0 END
         |            AS BIGINT) AS breakout
         |FROM b1 WHERE n_win = 20 ORDER BY symbol, bucket_ms""".stripMargin,
    "q_pivot_points" ->
      s"""WITH ${graft.QueryPack.barsCteAt(86400)},
         |b0 AS (
         |  SELECT symbol, bucket_ms,
         |         CAST(floor(high * 100 + 0.5) AS BIGINT) AS h,
         |         CAST(floor(low * 100 + 0.5) AS BIGINT) AS l,
         |         CAST(floor(close * 100 + 0.5) AS BIGINT) AS c
         |  FROM bars
         |),
         |b1 AS (
         |  SELECT symbol, bucket_ms, c,
         |         lag(h) OVER ws AS ph, lag(l) OVER ws AS pl,
         |         lag(c) OVER ws AS pc
         |  FROM b0 WINDOW ws AS (PARTITION BY symbol ORDER BY bucket_ms)
         |),
         |b2 AS (SELECT *, ph + pl + pc AS t3 FROM b1 WHERE pc IS NOT NULL)
         |SELECT symbol, bucket_ms,
         |       t3 / 300.0 AS pivot,
         |       (2 * t3 - 3 * pl) / 300.0 AS r1,
         |       (2 * t3 - 3 * ph) / 300.0 AS s1,
         |       (t3 + 3 * (ph - pl)) / 300.0 AS r2,
         |       (t3 - 3 * (ph - pl)) / 300.0 AS s2,
         |       CAST(CASE WHEN 3 * c > t3 THEN 1 WHEN 3 * c < t3 THEN -1
         |            ELSE 0 END AS BIGINT) AS close_vs_pivot
         |FROM b2 ORDER BY symbol, bucket_ms""".stripMargin,
    "q_gap_analysis" ->
      s"""WITH ${graft.QueryPack.barsCteAt(86400)},
         |b0 AS (
         |  SELECT symbol, bucket_ms,
         |         CAST(floor(open * 100 + 0.5) AS BIGINT) AS o,
         |         CAST(floor(high * 100 + 0.5) AS BIGINT) AS h,
         |         CAST(floor(low * 100 + 0.5) AS BIGINT) AS l,
         |         CAST(floor(close * 100 + 0.5) AS BIGINT) AS c
         |  FROM bars
         |),
         |b1 AS (
         |  SELECT *, lag(c) OVER (PARTITION BY symbol ORDER BY bucket_ms) AS pc
         |  FROM b0
         |),
         |b2 AS (SELECT *, o - pc AS gap_cents FROM b1 WHERE pc IS NOT NULL)
         |SELECT symbol, bucket_ms, gap_cents,
         |       ${graft.functions.Port.rsql(
                   "CAST(gap_cents AS DOUBLE) * 10000 / CAST(pc AS DOUBLE)", 6)}
         |         AS gap_bps,
         |       CAST(CASE WHEN gap_cents > 0 AND l <= pc THEN 1
         |                 WHEN gap_cents < 0 AND h >= pc THEN 1
         |                 ELSE 0 END AS BIGINT) AS filled,
         |       CAST(CASE WHEN gap_cents > 0 THEN 1 WHEN gap_cents < 0 THEN -1
         |            ELSE 0 END AS BIGINT) AS direction
         |FROM b2 ORDER BY symbol, bucket_ms""".stripMargin,
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
