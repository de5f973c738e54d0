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
  * snapped to 12 decimals on both engines so aggregate summation order
  * can never leak into the hash.
  */
object MarketStatsPack extends QueryPack {

  /** Per-symbol simple returns over bars at `sec` granularity, joined
    * with the equal-weight market return of each bucket.
    */
  private def retsWithMarket(s: SparkSession, d: String, sec: Long): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("bucket_ms")
    val rets = graft.operators.Bars.ohlcvCached(s, d, sec)
      .select(col("symbol"), col("bucket_ms"), col("close"))
      .withColumn("x", col("close") / lag(col("close"), 1).over(w) - 1)
      .filter(col("x").isNotNull)
    val mkt = rets.groupBy("bucket_ms")
      .agg(Port.r(avg(col("x")), 12).as("y"))
    rets.join(mkt, "bucket_ms").select("symbol", "bucket_ms", "x", "y")
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
      // one symbol, collapsing the market to the symbol itself) and
      // keeps prefix-sum magnitudes small enough that the diff-of-
      // prefix moments stay far inside the 6-decimal snap. All five
      // moments are prefix-sum differences over one shared
      // (symbol, bucket) sort.
      val k = 20
      val w = Window.partitionBy("symbol").orderBy("bucket_ms")
      val cum = w.rowsBetween(Window.unboundedPreceding, 0)
      def sliding(c: org.apache.spark.sql.Column) =
        c - coalesce(lag(c, k).over(w), lit(0.0))
      val base = retsWithMarket(s, d, 3600)
        .withColumn("rn", row_number().over(w))
        .withColumn("_px", sum(col("x")).over(cum))
        .withColumn("_py", sum(col("y")).over(cum))
        .withColumn("_pxy", sum(col("x") * col("y")).over(cum))
        .withColumn("_pxx", sum(col("x") * col("x")).over(cum))
        .withColumn("_pyy", sum(col("y") * col("y")).over(cum))
      val num = lit(k.toDouble) * col("sxy") - col("sx") * col("sy")
      val den = sqrt(greatest(lit(k.toDouble) * col("sxx") - col("sx") * col("sx"), lit(0.0)) *
        greatest(lit(k.toDouble) * col("syy") - col("sy") * col("sy"), lit(0.0)))
      // sliding diffs BEFORE the warmup filter: a window lag evaluated
      // after filter(rn >= k) would run over the filtered rowset and
      // silently widen the first k-1 windows per symbol
      base
        .withColumn("sx", sliding(col("_px")))
        .withColumn("sy", sliding(col("_py")))
        .withColumn("sxy", sliding(col("_pxy")))
        .withColumn("sxx", sliding(col("_pxx")))
        .withColumn("syy", sliding(col("_pyy")))
        .filter(col("rn") >= k)
        .select(col("symbol"), col("bucket_ms"),
          Port.r(num / nullif(den, lit(0.0)), 6).as("roll_corr"))
        .orderBy("symbol", "bucket_ms")
    }),
    "q_market_beta" -> ((s, d) => {
      // CAPM regression per symbol on daily returns: beta vs the
      // equal-weight market, intercept alpha, and R². One aggregate of
      // five moments per symbol — no window at all.
      val m = retsWithMarket(s, d, 86400)
        .groupBy("symbol")
        .agg(count(lit(1)).as("n_days"),
          sum(col("y")).as("sx"), sum(col("x")).as("sy"),
          sum(col("y") * col("x")).as("sxy"),
          sum(col("y") * col("y")).as("sxx"),
          sum(col("x") * col("x")).as("syy"))
      val n = col("n_days").cast("double")
      val beta = (n * col("sxy") - col("sx") * col("sy")) /
        (n * col("sxx") - col("sx") * col("sx"))
      val r2 = pow(n * col("sxy") - col("sx") * col("sy"), 2) /
        ((n * col("sxx") - col("sx") * col("sx")) *
          (n * col("syy") - col("sy") * col("sy")))
      m.select(col("symbol"), col("n_days"),
        Port.r(beta, 6).as("beta"),
        Port.r((col("sy") - beta * col("sx")) / n, 6).as("alpha"),
        Port.r(r2, 6).as("r2"))
        .orderBy("symbol")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_rolling_corr" ->
      s"""WITH ${graft.QueryPack.barsCteAt(3600)}$retsCte,
         |wnd AS (
         |  SELECT symbol, bucket_ms, row_number() OVER w AS rn,
         |         sum(x) OVER w20 AS sx, sum(y) OVER w20 AS sy,
         |         sum(x*y) OVER w20 AS sxy, sum(x*x) OVER w20 AS sxx,
         |         sum(y*y) OVER w20 AS syy
         |  FROM j
         |  WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ms),
         |         w20 AS (PARTITION BY symbol ORDER BY bucket_ms ROWS 19 PRECEDING)
         |)
         |SELECT symbol, bucket_ms,
         |       ${Port.rsql("(20.0*sxy - sx*sy) / nullif(sqrt(greatest(20.0*sxx - sx*sx, 0) * greatest(20.0*syy - sy*sy, 0)), 0)", 6)} AS roll_corr
         |FROM wnd WHERE rn >= 20 ORDER BY symbol, bucket_ms""".stripMargin,
    "q_market_beta" ->
      s"""WITH ${graft.QueryPack.barsCteAt(86400)}$retsCte,
         |m AS (
         |  SELECT symbol, count(*) AS n_days,
         |         sum(y) AS sx, sum(x) AS sy, sum(y*x) AS sxy,
         |         sum(y*y) AS sxx, sum(x*x) AS syy
         |  FROM j GROUP BY symbol
         |)
         |SELECT symbol, n_days,
         |       ${Port.rsql("(n_days*sxy - sx*sy) / (n_days*sxx - sx*sx)", 6)} AS beta,
         |       ${Port.rsql("(sy - (n_days*sxy - sx*sy) / (n_days*sxx - sx*sx) * sx) / n_days", 6)} AS alpha,
         |       ${Port.rsql("pow(n_days*sxy - sx*sy, 2) / ((n_days*sxx - sx*sx) * (n_days*syy - sy*sy))", 6)} AS r2
         |FROM m ORDER BY symbol""".stripMargin
  )
}
