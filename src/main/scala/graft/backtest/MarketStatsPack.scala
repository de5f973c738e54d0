package graft.backtest

import graft.QueryPack
import graft.functions.Port
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-sectional market statistics over the bar feed: rolling
  * return correlation vs the equal-weight market, and per-symbol CAPM
  * beta/alpha (the cross-asset analytics the reference's dashboard
  * summarizes visually; dashboard.py performance views).
  *
  * Scale shapes: returns are per-symbol windows (scale with symbols,
  * not rows); the market return is a per-bucket aggregate joined back
  * on the bucket key (co-partitioned, one shuffle); rolling moments
  * are prefix-sum differences sharing ONE window sort per symbol —
  * never a per-row frame rescan (round-2 lesson). The market return is
  * snapped to 12 decimals on both engines, and all regression/corr
  * moments are exact integer sums of 1e-12-quantized returns
  * (decimal(38,0) / HUGEINT) so summation order can never leak into
  * the hash — in either engine, at any scale.
  */
object MarketStatsPack extends QueryPack {

  /** Per-symbol simple returns over bars at `sec` granularity, joined
    * with the equal-weight market return of each bucket.
    */
  private def retsWithMarket(s: SparkSession, d: String, sec: Long): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("bucket_ms")
    // The market return is a whole-bucket window avg, not groupBy +
    // join-back: the old self-join planned the returns scan + lag
    // window TWICE (once under the aggregate, once as the join probe)
    // plus two join exchanges. The bucket partition is bounded by the
    // symbol universe, and the snap-to-1e-12 parity posture is the one
    // the hash aggregate already had (float partial-sum order is
    // nondeterministic either way; the oracle's GROUP BY avg matches
    // through the snap, same as before).
    graft.operators.Bars.ohlcvCached(s, d, sec)
      .select(col("symbol"), col("bucket_ms"), col("close"))
      .withColumn("x", col("close") / lag(col("close"), 1).over(w) - 1)
      .filter(col("x").isNotNull)
      .withColumn("y",
        Port.r(avg(col("x")).over(Window.partitionBy("bucket_ms")), 12))
      .select("symbol", "bucket_ms", "x", "y")
  }

  /** DuckDB mirror of [[retsWithMarket]] (final CTE: j), appended to a
    * bars CTE from QueryPack.barsCteAt.
    */
  private def retsCte: String =
    s""",
       |rets AS (
       |  SELECT symbol, bucket_ms,
       |         close / lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ms) - 1 AS x
       |  FROM bars
       |),
       |rnn AS (SELECT * FROM rets WHERE x IS NOT NULL),
       |mkt AS (SELECT bucket_ms, ${Port.rsql("avg(x)", 12)} AS y FROM rnn GROUP BY bucket_ms),
       |j AS (SELECT r.symbol, r.bucket_ms, r.x, m.y FROM rnn r JOIN mkt m USING (bucket_ms))""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rolling_corr" -> ((s, d) => {
      // 20-bar rolling Pearson correlation of each symbol's hourly
      // returns vs the market. Hourly granularity keeps every bucket a
      // real cross-section (minute buckets at test scale mostly hold
      // one symbol, collapsing the market to the symbol itself).
      //
      // Exact-moment parity: double summation order differs BETWEEN
      // engines (measured: DuckDB's cumulative window sum is a segment
      // tree, not left-to-right — 4382/5000 random prefixes differ in
      // the last ulp from sequential accumulation), so float moments
      // only hash-match while the snap absorbs the noise. Instead the
      // returns are quantized to 1e-12 fixed point and all five moments
      // are EXACT integer sums (decimal(38,0) here, HUGEINT in the
      // oracle) — order-independent, so the two engines agree bit-for-
      // bit regardless of how either schedules the window, at any
      // scale. The Spark side still takes prefix-sum differences over
      // ONE shared (symbol, bucket) sort (round-2 lesson: never a
      // per-row frame rescan); exactness makes the formulation
      // mathematically identical to the oracle's direct 20-row frames.
      val k = 20
      val w = Window.partitionBy("symbol").orderBy("bucket_ms")
      val cum = w.rowsBetween(Window.unboundedPreceding, 0)
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val zero = lit(0).cast(dec)
      def q12(c: org.apache.spark.sql.Column) =
        floor(c * 1e12 + lit(0.5)).cast(dec)
      // window layering (r07): the six cumulative moments share ONE
      // projection (one WindowExec), their five k-lags a second — the
      // old withColumn chain planned one Window operator per expression
      val base = retsWithMarket(s, d, 3600)
        .withColumn("xi", q12(col("x")))
        .withColumn("yi", q12(col("y")))
        .select(col("*"),
          row_number().over(w).as("rn"),
          sum(col("xi")).over(cum).as("_px"),
          sum(col("yi")).over(cum).as("_py"),
          sum(col("xi") * col("yi")).over(cum).as("_pxy"),
          sum(col("xi") * col("xi")).over(cum).as("_pxx"),
          sum(col("yi") * col("yi")).over(cum).as("_pyy"))
        .select(col("*"),
          lag(col("_px"), k).over(w).as("_lpx"),
          lag(col("_py"), k).over(w).as("_lpy"),
          lag(col("_pxy"), k).over(w).as("_lpxy"),
          lag(col("_pxx"), k).over(w).as("_lpxx"),
          lag(col("_pyy"), k).over(w).as("_lpyy"))
      def sliding(p: String, lp: String) = col(p) - coalesce(col(lp), zero)
      // num/den share the 1e24 scale factor, so the ratio is the
      // correlation; the only float ops are the final cast/mul/sqrt/div
      // on identical exact-integer inputs.
      val num = (lit(k) * col("sxy") - col("sx") * col("sy")).cast("double")
      val den = sqrt(
        greatest(lit(k) * col("sxx") - col("sx") * col("sx"), zero).cast("double") *
          greatest(lit(k) * col("syy") - col("sy") * col("sy"), zero).cast("double"))
      // sliding diffs BEFORE the warmup filter: a window lag evaluated
      // after filter(rn >= k) would run over the filtered rowset and
      // silently widen the first k-1 windows per symbol
      base
        .withColumn("sx", sliding("_px", "_lpx"))
        .withColumn("sy", sliding("_py", "_lpy"))
        .withColumn("sxy", sliding("_pxy", "_lpxy"))
        .withColumn("sxx", sliding("_pxx", "_lpxx"))
        .withColumn("syy", sliding("_pyy", "_lpyy"))
        .filter(col("rn") >= k)
        .select(col("symbol"), col("bucket_ms"),
          Port.r(num / nullif(den, lit(0.0)), 6).as("roll_corr"))
        .orderBy("symbol", "bucket_ms")
    }),
    "q_corr_matrix" -> ((s, d) => {
      // Full symbol×symbol Pearson correlation of hourly returns over
      // the pairs' COMMON buckets (upper triangle incl. diagonal) —
      // the portfolio-optimizer input q_asset_stats reads one axis of.
      // Output is dimension² (symbols × symbols); the pair build is a
      // bucket-keyed self-join whose per-bucket fanout is bounded by
      // the symbol universe — linear in bars at any history length,
      // never bars×bars. Same exact-moment parity as the rest of the
      // pack: quantized returns, exact decimal(38,0)/HUGEINT
      // co-moments, zero-variance pairs pin 0.0 on both engines (the
      // q_ic_decay degenerate-data rule).
      // Quantization is 1e-8 units (NOT the windowed queries' 1e-12):
      // these co-moments span the FULL history, so n_obs*sxx grows as
      // buckets² × return². Headroom at 1e-8 with the feed's measured
      // |return| ≤ O(1e4): xi ≤ 1e12, sxx ≤ n·1e24, n·sxx ≤ n²·1e24 —
      // under the 1e37 exact-integer ceiling (round13-state: Spark
      // decimal38 < DuckDB INT128) up to n = 1e6 hourly buckets
      // (~114 years). Corr is scale-free, so nothing is lost.
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val w = Window.partitionBy("symbol").orderBy("bucket_ms")
      val rets = graft.operators.Bars.ohlcvCached(s, d, 3600)
        .select(col("symbol"), col("bucket_ms"), col("close"))
        .withColumn("x", col("close") / lag(col("close"), 1).over(w) - 1)
        .filter(col("x").isNotNull)
        .select(col("symbol"), col("bucket_ms"),
          floor(col("x") * 1e8 + lit(0.5)).cast(dec).as("xi"))
      val a = rets.select(col("symbol").as("sym1"), col("bucket_ms"),
        col("xi").as("x1"))
      val b = rets.select(col("symbol").as("sym2"), col("bucket_ms"),
        col("xi").as("x2"))
      val m = a.join(b, "bucket_ms")
        .filter(col("sym1") <= col("sym2"))
        .groupBy("sym1", "sym2")
        .agg(count(lit(1)).as("n_obs"),
          sum(col("x1")).as("sx"), sum(col("x2")).as("sy"),
          sum(col("x1") * col("x2")).as("sxy"),
          sum(col("x1") * col("x1")).as("sxx"),
          sum(col("x2") * col("x2")).as("syy"))
      val num = (col("n_obs") * col("sxy") - col("sx") * col("sy")).cast("double")
      val dxx = col("n_obs") * col("sxx") - col("sx") * col("sx")
      val dyy = col("n_obs") * col("syy") - col("sy") * col("sy")
      m.select(col("sym1"), col("sym2"), col("n_obs"),
        when(dxx === 0 || dyy === 0, lit(0.0)).otherwise(
          Port.r(num / sqrt(dxx.cast("double") * dyy.cast("double")), 6))
          .as("corr"))
        .orderBy("sym1", "sym2")
    }),
    "q_market_beta" -> ((s, d) => {
      // CAPM regression per symbol on daily returns: beta vs the
      // equal-weight market, intercept alpha, and R². One aggregate of
      // five moments per symbol — no window at all. Same exact-moment
      // parity as q_rolling_corr: a hash aggregate's partial-sum order
      // is nondeterministic even run-to-run, so the moments are exact
      // integer sums of 1e-12-quantized returns; the regression formula
      // then runs identical float ops on identical inputs in both
      // engines. Scale factors cancel in beta/r2; alpha divides the
      // 1e12 back out explicitly.
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      def q12(c: org.apache.spark.sql.Column) =
        floor(c * 1e12 + lit(0.5)).cast(dec)
      val m = retsWithMarket(s, d, 86400)
        .select(col("symbol"), q12(col("y")).as("xi"), q12(col("x")).as("yi"))
        .groupBy("symbol")
        .agg(count(lit(1)).as("n_days"),
          sum(col("xi")).as("sx"), sum(col("yi")).as("sy"),
          sum(col("xi") * col("yi")).as("sxy"),
          sum(col("xi") * col("xi")).as("sxx"),
          sum(col("yi") * col("yi")).as("syy"))
      val n = col("n_days").cast("double")
      val num = (col("n_days") * col("sxy") - col("sx") * col("sy")).cast("double")
      val denB = (col("n_days") * col("sxx") - col("sx") * col("sx")).cast("double")
      val denY = (col("n_days") * col("syy") - col("sy") * col("sy")).cast("double")
      val beta = num / denB
      m.select(col("symbol"), col("n_days"),
        Port.r(beta, 6).as("beta"),
        Port.r((col("sy").cast("double") / 1e12 - beta * (col("sx").cast("double") / 1e12)) / n, 6).as("alpha"),
        Port.r(pow(num, 2) / (denB * denY), 6).as("r2"))
        .orderBy("symbol")
    })
  )

  def oracles: Map[String, String] = Map(
    // Integer-moment mirrors: identical 1e-12 quantization, exact
    // HUGEINT sums (order-independent — the direct 20-row frames here
    // equal the Spark side's prefix-sum differences exactly), identical
    // final float ops.
    "q_rolling_corr" ->
      s"""WITH ${graft.QueryPack.barsCteAt(3600)}$retsCte,
         |qz AS (
         |  SELECT symbol, bucket_ms,
         |         CAST(floor(x * 1e12 + 0.5) AS HUGEINT) AS xi,
         |         CAST(floor(y * 1e12 + 0.5) AS HUGEINT) AS yi
         |  FROM j
         |),
         |wnd AS (
         |  SELECT symbol, bucket_ms, row_number() OVER w AS rn,
         |         sum(xi) OVER w20 AS sx, sum(yi) OVER w20 AS sy,
         |         sum(xi*yi) OVER w20 AS sxy, sum(xi*xi) OVER w20 AS sxx,
         |         sum(yi*yi) OVER w20 AS syy
         |  FROM qz
         |  WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ms),
         |         w20 AS (PARTITION BY symbol ORDER BY bucket_ms ROWS 19 PRECEDING)
         |)
         |SELECT symbol, bucket_ms,
         |       ${Port.rsql("CAST(20*sxy - sx*sy AS DOUBLE) / nullif(sqrt(CAST(greatest(20*sxx - sx*sx, 0) AS DOUBLE) * CAST(greatest(20*syy - sy*sy, 0) AS DOUBLE)), 0)", 6)} AS roll_corr
         |FROM wnd WHERE rn >= 20 ORDER BY symbol, bucket_ms""".stripMargin,
    "q_corr_matrix" ->
      s"""WITH ${graft.QueryPack.barsCteAt(3600)},
         |rets AS (
         |  SELECT symbol, bucket_ms,
         |         close / lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ms) - 1 AS x
         |  FROM bars
         |),
         |qz AS (
         |  SELECT symbol, bucket_ms,
         |         CAST(floor(x * 1e8 + 0.5) AS HUGEINT) AS xi
         |  FROM rets WHERE x IS NOT NULL
         |),
         |p AS (
         |  SELECT a.symbol AS sym1, b.symbol AS sym2, count(*) AS n_obs,
         |         sum(a.xi) AS sx, sum(b.xi) AS sy, sum(a.xi * b.xi) AS sxy,
         |         sum(a.xi * a.xi) AS sxx, sum(b.xi * b.xi) AS syy
         |  FROM qz a JOIN qz b USING (bucket_ms)
         |  WHERE a.symbol <= b.symbol
         |  GROUP BY 1, 2
         |)
         |SELECT sym1, sym2, n_obs,
         |       CASE WHEN n_obs * sxx - sx * sx = 0 OR n_obs * syy - sy * sy = 0
         |            THEN 0.0 ELSE
         |         ${Port.rsql(
                     "CAST(n_obs * sxy - sx * sy AS DOUBLE) / sqrt(CAST(n_obs * sxx - sx * sx AS DOUBLE) * CAST(n_obs * syy - sy * sy AS DOUBLE))", 6)}
         |       END AS corr
         |FROM p ORDER BY sym1, sym2""".stripMargin,
    "q_market_beta" ->
      s"""WITH ${graft.QueryPack.barsCteAt(86400)}$retsCte,
         |qz AS (
         |  SELECT symbol,
         |         CAST(floor(y * 1e12 + 0.5) AS HUGEINT) AS xi,
         |         CAST(floor(x * 1e12 + 0.5) AS HUGEINT) AS yi
         |  FROM j
         |),
         |m AS (
         |  SELECT symbol, count(*) AS n_days,
         |         sum(xi) AS sx, sum(yi) AS sy, sum(xi*yi) AS sxy,
         |         sum(xi*xi) AS sxx, sum(yi*yi) AS syy
         |  FROM qz GROUP BY symbol
         |),
         |f AS (
         |  SELECT symbol, n_days,
         |         CAST(n_days*sxy - sx*sy AS DOUBLE) AS num,
         |         CAST(n_days*sxx - sx*sx AS DOUBLE) AS den_b,
         |         CAST(n_days*syy - sy*sy AS DOUBLE) AS den_y,
         |         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
         |  FROM m
         |)
         |SELECT symbol, n_days,
         |       ${Port.rsql("num / den_b", 6)} AS beta,
         |       ${Port.rsql("(syd / 1e12 - (num / den_b) * (sxd / 1e12)) / n_days", 6)} AS alpha,
         |       ${Port.rsql("pow(num, 2) / (den_b * den_y)", 6)} AS r2
         |FROM f ORDER BY symbol""".stripMargin
  )
}
