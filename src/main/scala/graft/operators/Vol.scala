package graft.operators

import graft.functions.Port
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Daily volatility decomposition and cross-asset lead-lag analytics
  * over the tick/bar feeds: realized variance + bipower variation with
  * a jump ratio (Barndorff-Nielsen & Shephard 2004), Amihud (2002)
  * illiquidity, intraday time-of-day seasonality, and pairwise
  * lead-lag cross-correlation. Extends the reference's market-stats
  * family (dashboard.py performance views, analytics/market_stats)
  * with the volatility diagnostics a risk layer reads next to
  * q_rolling_corr / q_market_beta.
  *
  * Scale posture: the daily measures window-partition by (symbol,
  * day) — one symbol-day of ticks per task, naturally bounded at any
  * corpus size, no cross-chunk linking needed because the literature
  * definitions themselves exclude overnight gaps. All running sums
  * are exact integers (price cents), so Spark and the DuckDB mirror
  * agree bit-for-bit regardless of partial-aggregation order. The
  * lead-lag join shuffles the hour-bar diff frame on the bucket key
  * (cross-sections are symbol-universe bounded); co-moments are exact
  * decimal(38,0)/HUGEINT sums and Pearson is one mirrored op chain.
  */
object Vol {

  private val dec38 = DecimalType(38, 0)
  private val DayNs = 86400000000000L
  private val HourNs = 3600000000000L

  /** Within-day cent diffs per symbol: dpc_i = cents_i − cents_{i−1}
    * over ticks of the same (symbol, day); a day's first tick has no
    * diff (overnight excluded, as realized-variance estimators
    * require).
    */
  private def dayDiffs(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("symbol", "day").orderBy("ts", "event_id")
    Micro.intTicks(s, d)
      .withColumn("day", expr(s"ts div $DayNs"))
      .withColumn("dpc", col("cents") - lag("cents", 1).over(w))
  }

  /** Realized variance RV = Σ dpc² and bipower variation
    * BV = Σ |dpc_i·dpc_{i−1}| per (symbol, day), both exact integer
    * cent² sums, plus the jump ratio max(1 − (π/2)·BV/RV, 0) — the
    * continuous-vs-jump decomposition (BV is robust to jumps, RV is
    * not, so their snapped gap is the jump share). π is the same
    * nearest-double in every IEEE engine.
    */
  def realizedVol(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("symbol", "day").orderBy("ts", "event_id")
    // dprev = dpc_{i-1} = lag(cents,1) - lag(cents,2): expressing it
    // from cents lags keeps BOTH diffs in the ONE WindowExec that
    // dayDiffs already runs (lag(dpc) would need a second window pass
    // reading the first's output).
    dayDiffs(s, d)
      .withColumn("dprev", lag("cents", 1).over(w) - lag("cents", 2).over(w))
      .filter(col("dpc").isNotNull)
      .groupBy("symbol", "day")
      .agg(count(lit(1)).as("n_diffs"),
        sum(col("dpc") * col("dpc")).as("rv_cents2"),
        coalesce(sum(abs(col("dpc") * col("dprev"))), lit(0L)).as("bv_cents2"))
      .withColumn("jump_ratio",
        when(col("rv_cents2") === 0, lit(0.0)).otherwise(Port.r(
          greatest(lit(1.0) - (lit(math.Pi) / 2) *
            (col("bv_cents2").cast("double") / col("rv_cents2").cast("double")),
            lit(0.0)), 6)))
      .select("symbol", "day", "n_diffs", "rv_cents2", "bv_cents2", "jump_ratio")
      .orderBy("symbol", "day")
  }

  /** Amihud (2002) illiquidity per symbol: the mean over days of
    * |daily return| / daily dollar volume, reported ×1e9. The daily
    * ratio is snapped to exact 1e-15 integer units BEFORE the
    * cross-day mean (the windowed-float-sum portability rule), so the
    * per-symbol sum is order-independent; the mean is one IEEE
    * division of exact integers.
    */
  def amihud(s: SparkSession, d: String): DataFrame =
    Micro.intTicks(s, d)
      .withColumn("day", expr(s"ts div $DayNs"))
      .groupBy("symbol", "day")
      .agg(expr("min_by(cents, ts)").as("open_c"),
        expr("max_by(cents, ts)").as("close_c"),
        sum("dollar_c").as("dollar_c"))
      .withColumn("illiq_u",
        floor(abs(col("close_c").cast("double") / col("open_c").cast("double") - 1)
          / col("dollar_c").cast("double") * lit(1e15) + lit(0.5)).cast("long"))
      .groupBy("symbol")
      .agg(count(lit(1)).as("n_days"), sum("illiq_u").as("s_u"))
      .withColumn("amihud_e9",
        Port.r(col("s_u").cast("double") / (col("n_days") * 1e6), 6))
      .select("symbol", "n_days", "amihud_e9")
      .orderBy("symbol")

  /** Intraday seasonality profile per (symbol, hour-of-day): tick
    * count, exact volume, within-day realized variance mass, and the
    * hour's share of the symbol's total volume. The share window runs
    * over the 24-row-per-symbol AGGREGATED frame, not ticks.
    */
  def intradayProfile(s: SparkSession, d: String): DataFrame = {
    val g = dayDiffs(s, d)
      .withColumn("hour_of_day", expr(s"(ts % $DayNs) div $HourNs"))
      .groupBy("symbol", "hour_of_day")
      .agg(count(lit(1)).as("n_ticks"),
        sum("vol").as("volume"),
        coalesce(sum(col("dpc") * col("dpc")), lit(0L)).as("rv_cents2"))
    g.withColumn("vol_share", Port.r(col("volume").cast("double") /
        sum(col("volume")).over(Window.partitionBy("symbol")).cast("double"), 6))
      .select("symbol", "hour_of_day", "n_ticks", "volume", "rv_cents2", "vol_share")
      .orderBy("symbol", "hour_of_day")
  }

  /** Ornstein-Uhlenbeck mean-reversion half-life per symbol: OLS slope
    * b of Δc_t on c_{t−1} over minute-bar cents (exact integer
    * moments), half-life = −ln 2 / ln(1+b) in bars when −1 < b < 0
    * (null otherwise — no reversion to time). −ln 2 is emitted as the
    * same literal double on both engines (the JVM-vs-libm rule);
    * ln(1+b) runs on identical doubles and the result snaps at 1e-4.
    */
  def ouHalfLife(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("bucket_ms")
    Bars.ohlcvCached(s, d, 60)
      .select(col("symbol"), col("bucket_ms"),
        floor(col("close") * 100 + lit(0.5)).cast("long").as("cents"))
      .withColumn("xl", lag("cents", 1).over(w))
      .filter(col("xl").isNotNull)
      .withColumn("y", col("cents") - col("xl"))
      .groupBy("symbol")
      .agg(count(lit(1)).as("n_obs"),
        sum(col("xl").cast(dec38)).as("sx"),
        sum(col("y").cast(dec38)).as("sy"),
        sum((col("xl") * col("y")).cast(dec38)).as("sxy"),
        sum((col("xl") * col("xl")).cast(dec38)).as("sxx"))
      .withColumn("nd", col("n_obs").cast(dec38))
      .withColumn("num", col("nd") * col("sxy") - col("sx") * col("sy"))
      .withColumn("dxx", col("nd") * col("sxx") - col("sx") * col("sx"))
      .withColumn("b", col("num").cast("double") / col("dxx").cast("double"))
      .withColumn("slope", Port.r(col("b"), 8))
      .withColumn("half_life_bars",
        when(col("b") < 0 && col("b") > -1,
          Port.r(lit(-math.log(2.0)) / log(lit(1.0) + col("b")), 4)))
      .select("symbol", "n_obs", "slope", "half_life_bars")
      .orderBy("symbol")
  }

  /** Day-of-week seasonality per symbol: average daily cent return
    * (close − open, exact integers) and volume by weekday (0 = Sunday;
    * epoch day 0 was a Thursday). One daily aggregate, one 7-row
    * weekday aggregate, single-division means.
    */
  def seasonalityDow(s: SparkSession, d: String): DataFrame =
    Micro.intTicks(s, d)
      .withColumn("day", expr(s"ts div $DayNs"))
      .groupBy("symbol", "day")
      .agg(expr("min_by(cents, ts)").as("open_c"),
        expr("max_by(cents, ts)").as("close_c"),
        sum("vol").as("volume"))
      .withColumn("dow", (col("day") + 4) % 7)
      .groupBy("symbol", "dow")
      .agg(count(lit(1)).as("n_days"),
        sum(col("close_c") - col("open_c")).as("s_ret"),
        sum("volume").as("total_volume"))
      .withColumn("avg_ret_cents",
        col("s_ret").cast("double") / col("n_days").cast("double"))
      .select("symbol", "dow", "n_days", "avg_ret_cents", "total_volume")
      .orderBy("symbol", "dow")

  /** Event study around extreme bar moves: for each symbol's top-10
    * largest absolute minute-bar cent moves (|Δp| desc, time asc
    * tiebreak), the average move at relative offsets −3..+3 minutes —
    * the abnormal-return context curve a signal researcher reads
    * before building an event trigger. The event set is tiny (10 ×
    * symbols × 7 offsets) and broadcast-joins back onto the bar frame;
    * means are exact integer sums over counts.
    */
  def eventStudy(s: SparkSession, d: String, topK: Int = 10,
                 maxOff: Int = 3): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("bucket_ms")
    val bars = Bars.ohlcvCached(s, d, 60)
      .select(col("symbol"), col("bucket_ms"),
        floor(col("close") * 100 + lit(0.5)).cast("long").as("cents"))
      .withColumn("dpc", col("cents") - lag("cents", 1).over(w))
      .filter(col("dpc").isNotNull)
      .select("symbol", "bucket_ms", "dpc")
    val events = bars
      .withColumn("rk", row_number().over(Window.partitionBy("symbol")
        .orderBy(abs(col("dpc")).desc, col("bucket_ms").asc)))
      .filter(col("rk") <= topK)
      .withColumn("off", explode(array((-maxOff to maxOff).map(k => lit(k.toLong)): _*)))
      .select(col("symbol"), col("off"),
        (col("bucket_ms") + col("off") * 60000L).as("bucket_ms"))
    bars.join(broadcast(events), Seq("symbol", "bucket_ms"))
      .groupBy("symbol", "off")
      .agg(count(lit(1)).as("n_obs"),
        sum("dpc").as("s_dpc"),
        sum(abs(col("dpc"))).as("s_abs"))
      .withColumn("avg_dpc", col("s_dpc").cast("double") / col("n_obs").cast("double"))
      .withColumn("avg_abs_dpc", col("s_abs").cast("double") / col("n_obs").cast("double"))
      .select("symbol", "off", "n_obs", "avg_dpc", "avg_abs_dpc")
      .orderBy("symbol", "off")
  }

  /** Markov regime-transition matrix per symbol over minute-bar return
    * states {−1, 0, +1} (down/flat/up by cent diff sign): transition
    * counts are exact integers; each row's probability divides by the
    * from-state total via a window over the ≤9-row-per-symbol
    * AGGREGATED matrix. The regime-persistence diagnostic read next to
    * q_return_acf/q_variance_ratio.
    */
  def markovTransitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("bucket_ms")
    Bars.ohlcvCached(s, d, 60)
      .select(col("symbol"), col("bucket_ms"),
        floor(col("close") * 100 + lit(0.5)).cast("long").as("cents"))
      .withColumn("s_to", signum(col("cents") - lag("cents", 1).over(w)).cast("int"))
      .withColumn("s_from", lag("s_to", 1).over(w))
      .filter(col("s_to").isNotNull && col("s_from").isNotNull)
      .groupBy("symbol", "s_from", "s_to")
      .agg(count(lit(1)).as("n_trans"))
      .withColumn("p", col("n_trans").cast("double") /
        sum(col("n_trans")).over(Window.partitionBy("symbol", "s_from")).cast("double"))
      .orderBy("symbol", "s_from", "s_to")
  }

  /** Wald–Wolfowitz runs test per symbol on the up/down sequence of
    * minute-bar cent diffs (flats dropped, the classic binary form):
    * R = 1 + Σ[sign flips], E[R] and Var[R] closed-form in the up/down
    * counts, z = (R − E)/√Var — every factor an exact integer, the
    * moments mirrored single IEEE op chains, z snapped.
    */
  def runsTest(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("bucket_ms")
    val signs = Bars.ohlcvCached(s, d, 60)
      .select(col("symbol"), col("bucket_ms"),
        floor(col("close") * 100 + lit(0.5)).cast("long").as("cents"))
      .withColumn("dpc", col("cents") - lag("cents", 1).over(w))
      .filter(col("dpc").isNotNull && col("dpc") =!= 0)
      .withColumn("sg", signum(col("dpc")).cast("int"))
    // the flip window re-partitions over the FILTERED sign stream
    val wf = Window.partitionBy("symbol").orderBy("bucket_ms")
    signs
      .withColumn("flip",
        when(lag("sg", 1).over(wf).isNull, 0L)
          .when(col("sg") =!= lag("sg", 1).over(wf), 1L).otherwise(0L))
      .groupBy("symbol")
      .agg(sum(when(col("sg") === 1, 1L).otherwise(0L)).as("n_up"),
        sum(when(col("sg") === -1, 1L).otherwise(0L)).as("n_down"),
        (sum(col("flip")) + 1L).as("n_runs"))
      .withColumn("m", (lit(2.0) * col("n_up") * col("n_down")).cast("double") /
        (col("n_up") + col("n_down")).cast("double") + lit(1.0))
      .withColumn("v",
        (lit(2.0) * col("n_up") * col("n_down") *
          (lit(2.0) * col("n_up") * col("n_down") - col("n_up") - col("n_down"))) /
          ((col("n_up") + col("n_down")).cast("double") *
            (col("n_up") + col("n_down")).cast("double") *
            (col("n_up") + col("n_down") - 1).cast("double")))
      .withColumn("z_score",
        // degenerate guard: one-sided sign streams (n_up or n_down = 0)
        // or a single diff make v = 0 / undefined — pin z to 0 in both
        // engines rather than compare NaN/Inf handling across them
        when(col("n_up") === 0 || col("n_down") === 0 ||
          col("n_up") + col("n_down") <= 1, lit(0.0))
          .otherwise(
            Port.r((col("n_runs").cast("double") - col("m")) / sqrt(col("v")), 6)))
      .select("symbol", "n_up", "n_down", "n_runs", "z_score")
      .orderBy("symbol")
  }

  /** Pairwise lead-lag cross-correlation: Pearson corr of symbol a's
    * hour-bar cent diff at bucket t vs symbol b's diff at t − lag·1h,
    * for every ordered pair a ≠ b and lag ∈ {0, 1, 2} — "does b lead
    * a". The lead side replicates once per lag (explode) with its
    * bucket key pre-shifted, so one equi-join on bucket_ms serves all
    * lags; missing buckets drop out of the inner join naturally.
    */
  def leadLagCorr(s: SparkSession, d: String,
                  lags: Seq[Long] = Seq(0L, 1L, 2L)): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("bucket_ms")
    val dx = Bars.ohlcvCached(s, d, 3600)
      .select(col("symbol"), col("bucket_ms"),
        floor(col("close") * 100 + lit(0.5)).cast("long").as("cents"))
      .withColumn("x", col("cents") - lag("cents", 1).over(w))
      .filter(col("x").isNotNull)
      .select("symbol", "bucket_ms", "x")
    val lead = dx
      .withColumn("lag", explode(array(lags.map(lit(_)): _*)))
      .select(col("symbol").as("symbol_lead"),
        (col("bucket_ms") + col("lag") * 3600000L).as("bucket_ms"),
        col("lag"), col("x").as("y"))
    dx.join(lead, "bucket_ms")
      .filter(col("symbol") =!= col("symbol_lead"))
      .groupBy("symbol", "symbol_lead", "lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x").cast(dec38)).as("sx"),
        sum(col("y").cast(dec38)).as("sy"),
        sum((col("x") * col("y")).cast(dec38)).as("sxy"),
        sum((col("x") * col("x")).cast(dec38)).as("sxx"),
        sum((col("y") * col("y")).cast(dec38)).as("syy"))
      .withColumn("nd", col("n_pairs").cast(dec38))
      .withColumn("num", col("nd") * col("sxy") - col("sx") * col("sy"))
      .withColumn("dxx", col("nd") * col("sxx") - col("sx") * col("sx"))
      .withColumn("dyy", col("nd") * col("syy") - col("sy") * col("sy"))
      .withColumn("xcorr",
        // zero-variance guard (same as q_ic_decay): a constant diff
        // series yields dxx/dyy = 0 — pin corr to 0 in both engines
        when(col("dxx") === 0 || col("dyy") === 0, lit(0.0))
          .otherwise(Port.r(col("num").cast("double") /
            sqrt(col("dxx").cast("double") * col("dyy").cast("double")), 6)))
      .select("symbol", "symbol_lead", "lag", "n_pairs", "xcorr")
      .orderBy("symbol", "symbol_lead", "lag")
  }

  /** Per-symbol skewness and excess kurtosis of minute-bar simple
    * returns, from four EXACT integer power sums of 1e-2-quantized
    * returns (centi-units: the synthetic feed's bar returns reach
    * O(10⁴), so finer grids overflow the quartic n³S4 term past 38
    * digits — measured: 1e-3 units put A4 at 1.1e38, over Spark's
    * decimal(38,0) ceiling while still inside DuckDB's INT128, an
    * engine-DIVERGENT overflow; centi keeps every term under 10³⁵
    * with 4 digits of headroom, and skew/kurt of O(1)+ returns lose
    * nothing at diagnostic precision). The
    * scale-free forms cancel n AND the quantization unit
    * before any float op: with A2 = n·S2−S1², A3 = n²·S3−3n·S2·S1+2S1³,
    * A4 = n³·S4−4n²·S3·S1+6n·S2·S1²−3S1⁴ (all exact decimal(38,0)/
    * HUGEINT), skew = A3/(A2·√A2) and excess kurt = A4/A2² − 3 — one
    * mirrored float chain each, √ is correctly rounded in both engines
    * (no pow). Zero-variance symbols pin 0.0.
    */
  def returnMoments(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("bucket_ms")
    val m = Bars.ohlcvCached(s, d, 60)
      .select(col("symbol"), col("bucket_ms"), col("close"))
      .withColumn("x", col("close") / lag(col("close"), 1).over(w) - 1)
      .filter(col("x").isNotNull)
      .select(col("symbol"),
        floor(col("x") * 1e2 + lit(0.5)).cast(dec38).as("xi"))
      .groupBy("symbol")
      .agg(count(lit(1)).as("n_rets"),
        sum(col("xi")).as("s1"),
        sum(col("xi") * col("xi")).as("s2"),
        sum(col("xi") * col("xi") * col("xi")).as("s3"),
        sum(col("xi") * col("xi") * col("xi") * col("xi")).as("s4"))
      .withColumn("nd", col("n_rets").cast(dec38))
      .withColumn("a2", col("nd") * col("s2") - col("s1") * col("s1"))
      .withColumn("a3", col("nd") * col("nd") * col("s3")
        - lit(3) * col("nd") * col("s2") * col("s1")
        + lit(2) * col("s1") * col("s1") * col("s1"))
      .withColumn("a4", col("nd") * col("nd") * col("nd") * col("s4")
        - lit(4) * col("nd") * col("nd") * col("s3") * col("s1")
        + lit(6) * col("nd") * col("s2") * col("s1") * col("s1")
        - lit(3) * col("s1") * col("s1") * col("s1") * col("s1"))
    m.select(col("symbol"), col("n_rets"),
      Port.r(col("s1").cast("double") / (col("n_rets") * 1e2), 8).as("mean_ret"),
      Port.r(sqrt(col("a2").cast("double")) / (col("n_rets") * 1e2), 8).as("sd_ret"),
      when(col("a2") === 0, lit(0.0)).otherwise(
        Port.r(col("a3").cast("double") /
          (col("a2").cast("double") * sqrt(col("a2").cast("double"))), 6))
        .as("skewness"),
      when(col("a2") === 0, lit(0.0)).otherwise(
        Port.r(col("a4").cast("double") /
          (col("a2").cast("double") * col("a2").cast("double")) - 3, 6))
        .as("excess_kurtosis"))
      .orderBy("symbol")
  }

  /** Daily market-concentration profile: per day, the HHI of symbol
    * volume shares (Σ(vᵢ/T)² ≡ Σvᵢ²/T², one division of exact integer
    * decimals), the top symbol's share, and the participant count.
    * Symbols are a dimension, so the day aggregate is dimension-sized
    * at any corpus scale.
    */
  def volumeHhi(s: SparkSession, d: String): DataFrame =
    Micro.intTicks(s, d)
      .groupBy(expr("ts div 86400000000000").as("day"), col("symbol"))
      .agg(sum(col("vol").cast(dec38)).as("v"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_symbols"),
        sum(col("v")).as("t"),
        sum(col("v") * col("v")).as("v2"),
        max(col("v")).as("vmax"))
      .select(col("day"), col("n_symbols"),
        col("t").cast("long").as("total_vol"),
        Port.r(col("v2").cast("double") /
          (col("t").cast("double") * col("t").cast("double")), 6).as("hhi"),
        Port.r(col("vmax").cast("double") / col("t").cast("double"), 6)
          .as("top_share"))
      .orderBy("day")
}

/** Pack registration + DuckDB mirrors for the Vol family. */
object VolPack extends graft.QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_realized_vol" -> ((s, d) => Vol.realizedVol(s, d)),
    "q_amihud_illiq" -> ((s, d) => Vol.amihud(s, d)),
    "q_intraday_profile" -> ((s, d) => Vol.intradayProfile(s, d)),
    "q_lead_lag_corr" -> ((s, d) => Vol.leadLagCorr(s, d)),
    "q_markov_transitions" -> ((s, d) => Vol.markovTransitions(s, d)),
    "q_runs_test" -> ((s, d) => Vol.runsTest(s, d)),
    "q_return_moments" -> ((s, d) => Vol.returnMoments(s, d)),
    "q_volume_hhi" -> ((s, d) => Vol.volumeHhi(s, d)),
    "q_seasonality_dow" -> ((s, d) => Vol.seasonalityDow(s, d)),
    "q_event_study" -> ((s, d) => Vol.eventStudy(s, d)),
    "q_ou_half_life" -> ((s, d) => Vol.ouHalfLife(s, d))
  )

  /** Mirror CTE: within-day cent diffs over the integer tick frame. */
  private val DayDiffCte: String =
    s"""${MicroPack.MtCte},
       |t2 AS (
       |  SELECT symbol, tsn // 86400000000000 AS day,
       |         (tsn % 86400000000000) // 3600000000000 AS hour_of_day,
       |         tsn, event_id, vol, cents,
       |         cents - lag(cents) OVER (PARTITION BY symbol, tsn // 86400000000000
       |           ORDER BY tsn, event_id) AS dpc
       |  FROM mt
       |)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_return_moments" ->
      s"""WITH ${graft.QueryPack.BarsCte},
         |rets AS (
         |  SELECT symbol,
         |         close / lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ms) - 1 AS x
         |  FROM bars
         |),
         |qz AS (
         |  SELECT symbol, CAST(floor(x * 1e2 + 0.5) AS HUGEINT) AS xi
         |  FROM rets WHERE x IS NOT NULL
         |),
         |ps AS (
         |  SELECT symbol, count(*) AS n_rets,
         |         sum(xi) AS s1, sum(xi*xi) AS s2,
         |         sum(xi*xi*xi) AS s3, sum(xi*xi*xi*xi) AS s4
         |  FROM qz GROUP BY symbol
         |),
         |a AS (
         |  SELECT symbol, n_rets,
         |         CAST(s1 AS DOUBLE) AS s1d,
         |         n_rets * s2 - s1 * s1 AS a2,
         |         n_rets * n_rets * s3 - 3 * n_rets * s2 * s1
         |           + 2 * s1 * s1 * s1 AS a3,
         |         n_rets * n_rets * n_rets * s4
         |           - 4 * n_rets * n_rets * s3 * s1
         |           + 6 * n_rets * s2 * s1 * s1
         |           - 3 * s1 * s1 * s1 * s1 AS a4
         |  FROM ps
         |)
         |SELECT symbol, n_rets,
         |       ${Port.rsql("s1d / (n_rets * 1e2)", 8)} AS mean_ret,
         |       ${Port.rsql("sqrt(CAST(a2 AS DOUBLE)) / (n_rets * 1e2)", 8)} AS sd_ret,
         |       CASE WHEN a2 = 0 THEN 0.0 ELSE
         |         ${Port.rsql("CAST(a3 AS DOUBLE) / (CAST(a2 AS DOUBLE) * sqrt(CAST(a2 AS DOUBLE)))", 6)}
         |       END AS skewness,
         |       CASE WHEN a2 = 0 THEN 0.0 ELSE
         |         ${Port.rsql("CAST(a4 AS DOUBLE) / (CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE)) - 3", 6)}
         |       END AS excess_kurtosis
         |FROM a ORDER BY symbol""".stripMargin,
    "q_volume_hhi" ->
      s"""WITH ${graft.QueryPack.TicksCte},
         |sv AS (
         |  SELECT epoch_ns(ts) // 86400000000000 AS day, symbol,
         |         CAST(sum(CAST(volume AS BIGINT)) AS HUGEINT) AS v
         |  FROM ticks GROUP BY 1, 2
         |),
         |agg AS (
         |  SELECT day, count(*) AS n_symbols, sum(v) AS t,
         |         sum(v*v) AS v2, max(v) AS vmax
         |  FROM sv GROUP BY day
         |)
         |SELECT day, n_symbols, CAST(t AS BIGINT) AS total_vol,
         |       ${Port.rsql("CAST(v2 AS DOUBLE) / (CAST(t AS DOUBLE) * CAST(t AS DOUBLE))", 6)} AS hhi,
         |       ${Port.rsql("CAST(vmax AS DOUBLE) / CAST(t AS DOUBLE)", 6)} AS top_share
         |FROM agg ORDER BY day""".stripMargin,
    "q_realized_vol" ->
      s"""WITH $DayDiffCte,
         |t3 AS (
         |  SELECT *, lag(dpc) OVER (PARTITION BY symbol, day
         |    ORDER BY tsn, event_id) AS dprev
         |  FROM t2
         |),
         |a AS (
         |  SELECT symbol, day, count(*) AS n_diffs,
         |         CAST(sum(dpc * dpc) AS BIGINT) AS rv_cents2,
         |         CAST(coalesce(sum(abs(dpc * dprev)), 0) AS BIGINT) AS bv_cents2
         |  FROM t3 WHERE dpc IS NOT NULL GROUP BY 1, 2
         |)
         |SELECT symbol, day, n_diffs, rv_cents2, bv_cents2,
         |       CASE WHEN rv_cents2 = 0 THEN 0.0 ELSE
         |         floor(greatest(1.0 - pi() / 2 *
         |           (CAST(bv_cents2 AS DOUBLE) / CAST(rv_cents2 AS DOUBLE)), 0.0)
         |           * 1e6 + 0.5) / 1e6 END AS jump_ratio
         |FROM a ORDER BY symbol, day""".stripMargin,
    "q_amihud_illiq" ->
      s"""WITH ${MicroPack.MtCte},
         |dd AS (
         |  SELECT symbol, tsn // 86400000000000 AS day,
         |         arg_min(cents, tsn) AS open_c, arg_max(cents, tsn) AS close_c,
         |         CAST(sum(dollar_c) AS BIGINT) AS dollar_c
         |  FROM mt GROUP BY 1, 2
         |),
         |u AS (
         |  SELECT symbol,
         |         CAST(floor(abs(CAST(close_c AS DOUBLE) / CAST(open_c AS DOUBLE) - 1)
         |           / CAST(dollar_c AS DOUBLE) * 1e15 + 0.5) AS BIGINT) AS illiq_u
         |  FROM dd
         |),
         |a AS (SELECT symbol, count(*) AS n_days, sum(illiq_u) AS s_u FROM u GROUP BY 1)
         |SELECT symbol, n_days,
         |       floor(CAST(s_u AS DOUBLE) / (n_days * 1e6) * 1e6 + 0.5) / 1e6 AS amihud_e9
         |FROM a ORDER BY symbol""".stripMargin,
    "q_intraday_profile" ->
      s"""WITH $DayDiffCte,
         |g AS (
         |  SELECT symbol, hour_of_day, count(*) AS n_ticks,
         |         CAST(sum(vol) AS BIGINT) AS volume,
         |         CAST(coalesce(sum(dpc * dpc), 0) AS BIGINT) AS rv_cents2
         |  FROM t2 GROUP BY 1, 2
         |)
         |SELECT symbol, hour_of_day, n_ticks, volume, rv_cents2,
         |       floor(CAST(volume AS DOUBLE)
         |         / CAST(sum(volume) OVER (PARTITION BY symbol) AS DOUBLE)
         |         * 1e6 + 0.5) / 1e6 AS vol_share
         |FROM g ORDER BY symbol, hour_of_day""".stripMargin,
    "q_ou_half_life" -> {
      val negLn2 = -math.log(2.0)
      s"""WITH ${graft.QueryPack.BarsCte},
         |d0 AS (
         |  SELECT symbol, bucket_ms,
         |         CAST(floor(close * 100 + 0.5) AS BIGINT) AS cents
         |  FROM bars
         |),
         |d1 AS (
         |  SELECT symbol, cents,
         |         lag(cents) OVER (PARTITION BY symbol ORDER BY bucket_ms) AS xl
         |  FROM d0
         |),
         |d2 AS (SELECT symbol, xl, cents - xl AS y FROM d1 WHERE xl IS NOT NULL),
         |a AS (
         |  SELECT symbol, count(*) AS n_obs,
         |         sum(xl) AS sx, sum(y) AS sy, sum(xl * y) AS sxy, sum(xl * xl) AS sxx
         |  FROM d2 GROUP BY 1
         |),
         |b0 AS (
         |  SELECT symbol, n_obs,
         |         CAST(CAST(n_obs AS HUGEINT) * sxy - sx * sy AS DOUBLE)
         |           / CAST(CAST(n_obs AS HUGEINT) * sxx - sx * sx AS DOUBLE) AS b
         |  FROM a
         |)
         |SELECT symbol, n_obs,
         |       floor(b * 1e8 + 0.5) / 1e8 AS slope,
         |       CASE WHEN b < 0 AND b > -1 THEN
         |         floor(CAST($negLn2 AS DOUBLE) / ln(1.0 + b) * 1e4 + 0.5) / 1e4
         |       END AS half_life_bars
         |FROM b0 ORDER BY symbol""".stripMargin
    },
    "q_seasonality_dow" ->
      s"""WITH ${MicroPack.MtCte},
         |dd AS (
         |  SELECT symbol, tsn // 86400000000000 AS day,
         |         arg_min(cents, tsn) AS open_c, arg_max(cents, tsn) AS close_c,
         |         CAST(sum(vol) AS BIGINT) AS volume
         |  FROM mt GROUP BY 1, 2
         |),
         |a AS (
         |  SELECT symbol, (day + 4) % 7 AS dow, count(*) AS n_days,
         |         CAST(sum(close_c - open_c) AS BIGINT) AS s_ret,
         |         CAST(sum(volume) AS BIGINT) AS total_volume
         |  FROM dd GROUP BY 1, 2
         |)
         |SELECT symbol, dow, n_days,
         |       CAST(s_ret AS DOUBLE) / CAST(n_days AS DOUBLE) AS avg_ret_cents,
         |       total_volume
         |FROM a ORDER BY symbol, dow""".stripMargin,
    "q_event_study" ->
      s"""WITH ${graft.QueryPack.BarsCte},
         |d0 AS (
         |  SELECT symbol, bucket_ms,
         |         CAST(floor(close * 100 + 0.5) AS BIGINT) AS cents
         |  FROM bars
         |),
         |d1 AS (
         |  SELECT symbol, bucket_ms,
         |         cents - lag(cents) OVER (PARTITION BY symbol ORDER BY bucket_ms) AS dpc
         |  FROM d0
         |),
         |dn AS (SELECT * FROM d1 WHERE dpc IS NOT NULL),
         |ev AS (
         |  SELECT symbol, bucket_ms FROM (
         |    SELECT symbol, bucket_ms,
         |           row_number() OVER (PARTITION BY symbol
         |             ORDER BY abs(dpc) DESC, bucket_ms) AS rk
         |    FROM dn
         |  ) WHERE rk <= 10
         |),
         |probe AS (
         |  SELECT e.symbol, CAST(o.off AS BIGINT) AS off,
         |         e.bucket_ms + o.off * 60000 AS bucket_ms
         |  FROM ev e CROSS JOIN (
         |    SELECT unnest([-3, -2, -1, 0, 1, 2, 3]) AS off) o
         |),
         |j AS (
         |  SELECT b.symbol, p.off, b.dpc
         |  FROM dn b JOIN probe p
         |    ON b.symbol = p.symbol AND b.bucket_ms = p.bucket_ms
         |),
         |a AS (
         |  SELECT symbol, off, count(*) AS n_obs,
         |         CAST(sum(dpc) AS BIGINT) AS s_dpc,
         |         CAST(sum(abs(dpc)) AS BIGINT) AS s_abs
         |  FROM j GROUP BY 1, 2
         |)
         |SELECT symbol, off, n_obs,
         |       CAST(s_dpc AS DOUBLE) / CAST(n_obs AS DOUBLE) AS avg_dpc,
         |       CAST(s_abs AS DOUBLE) / CAST(n_obs AS DOUBLE) AS avg_abs_dpc
         |FROM a ORDER BY symbol, off""".stripMargin,
    "q_markov_transitions" ->
      s"""WITH ${graft.QueryPack.BarsCte},
         |d0 AS (
         |  SELECT symbol, bucket_ms,
         |         CAST(floor(close * 100 + 0.5) AS BIGINT) AS cents
         |  FROM bars
         |),
         |d1 AS (
         |  SELECT symbol, bucket_ms,
         |         CAST(sign(cents - lag(cents) OVER (PARTITION BY symbol
         |           ORDER BY bucket_ms)) AS INT) AS s_to
         |  FROM d0
         |),
         |d2 AS (
         |  SELECT symbol, s_to,
         |         lag(s_to) OVER (PARTITION BY symbol ORDER BY bucket_ms) AS s_from
         |  FROM d1
         |),
         |m AS (
         |  SELECT symbol, s_from, s_to, count(*) AS n_trans
         |  FROM d2 WHERE s_to IS NOT NULL AND s_from IS NOT NULL GROUP BY 1, 2, 3
         |)
         |SELECT symbol, s_from, s_to, n_trans,
         |       CAST(n_trans AS DOUBLE) / CAST(sum(n_trans) OVER (
         |         PARTITION BY symbol, s_from) AS DOUBLE) AS p
         |FROM m ORDER BY symbol, s_from, s_to""".stripMargin,
    "q_runs_test" ->
      s"""WITH ${graft.QueryPack.BarsCte},
         |d0 AS (
         |  SELECT symbol, bucket_ms,
         |         CAST(floor(close * 100 + 0.5) AS BIGINT) AS cents
         |  FROM bars
         |),
         |d1 AS (
         |  SELECT symbol, bucket_ms,
         |         cents - lag(cents) OVER (PARTITION BY symbol ORDER BY bucket_ms) AS dpc
         |  FROM d0
         |),
         |sg AS (
         |  SELECT symbol, bucket_ms, CAST(sign(dpc) AS INT) AS sg
         |  FROM d1 WHERE dpc IS NOT NULL AND dpc <> 0
         |),
         |fl AS (
         |  SELECT symbol, sg,
         |         CASE WHEN lag(sg) OVER w IS NULL THEN 0
         |              WHEN sg <> lag(sg) OVER w THEN 1 ELSE 0 END AS flip
         |  FROM sg WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ms)
         |),
         |a AS (
         |  SELECT symbol,
         |         CAST(sum(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
         |         CAST(sum(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
         |         CAST(sum(flip) + 1 AS BIGINT) AS n_runs
         |  FROM fl GROUP BY 1
         |),
         |b AS (
         |  SELECT *,
         |         CAST(2 AS DOUBLE) * n_up * n_down
         |           / CAST(n_up + n_down AS DOUBLE) + 1.0 AS m,
         |         (CAST(2 AS DOUBLE) * n_up * n_down *
         |           (CAST(2 AS DOUBLE) * n_up * n_down - n_up - n_down))
         |           / (CAST(n_up + n_down AS DOUBLE) * CAST(n_up + n_down AS DOUBLE)
         |              * CAST(n_up + n_down - 1 AS DOUBLE)) AS v
         |  FROM a
         |)
         |SELECT symbol, n_up, n_down, n_runs,
         |       CASE WHEN n_up = 0 OR n_down = 0 OR n_up + n_down <= 1 THEN 0.0
         |            ELSE floor((CAST(n_runs AS DOUBLE) - m) / sqrt(v) * 1e6 + 0.5) / 1e6
         |       END AS z_score
         |FROM b ORDER BY symbol""".stripMargin,
    "q_lead_lag_corr" ->
      s"""WITH ${graft.QueryPack.barsCteAt(3600)},
         |d0 AS (
         |  SELECT symbol, bucket_ms,
         |         CAST(floor(close * 100 + 0.5) AS BIGINT) AS cents
         |  FROM bars
         |),
         |dx AS (
         |  SELECT symbol, bucket_ms,
         |         cents - lag(cents) OVER (PARTITION BY symbol ORDER BY bucket_ms) AS x
         |  FROM d0
         |),
         |dn AS (SELECT * FROM dx WHERE x IS NOT NULL),
         |ld AS (
         |  SELECT symbol AS symbol_lead, bucket_ms + l.lag * 3600000 AS bucket_ms,
         |         CAST(l.lag AS BIGINT) AS lag, x AS y
         |  FROM dn CROSS JOIN (SELECT unnest([0, 1, 2]) AS lag) l
         |),
         |j AS (
         |  SELECT a.symbol, b.symbol_lead, b.lag, a.x, b.y
         |  FROM dn a JOIN ld b USING (bucket_ms) WHERE a.symbol <> b.symbol_lead
         |),
         |m AS (
         |  SELECT symbol, symbol_lead, lag, count(*) AS n_pairs,
         |         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         |         sum(x * x) AS sxx, sum(y * y) AS syy
         |  FROM j GROUP BY 1, 2, 3
         |),
         |b2 AS (
         |  SELECT symbol, symbol_lead, lag, n_pairs,
         |         CAST(n_pairs AS HUGEINT) * sxy - sx * sy AS num,
         |         CAST(n_pairs AS HUGEINT) * sxx - sx * sx AS dxx,
         |         CAST(n_pairs AS HUGEINT) * syy - sy * sy AS dyy
         |  FROM m
         |)
         |SELECT symbol, symbol_lead, lag, n_pairs,
         |       CASE WHEN dxx = 0 OR dyy = 0 THEN 0.0
         |            ELSE floor(CAST(num AS DOUBLE)
         |              / sqrt(CAST(dxx AS DOUBLE) * CAST(dyy AS DOUBLE)) * 1e6 + 0.5) / 1e6
         |       END AS xcorr
         |FROM b2 ORDER BY symbol, symbol_lead, lag""".stripMargin
  )
}
