package graft.backtest

import graft.{QueryPack, Tables}
import graft.functions.Port
import graft.operators.Bars
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining strategy/risk surface: buy&hold, ensemble voting, bounded-
  * window EMA/MACD, fixed-risk sizing, trailing stops.
  * Reference: strategy.py:195 (BuyAndHoldStrategy), ml_strategy.py:312
  * (EnsembleStrategy), ml_strategy.py:150 (MACD features),
  * risk_monitor.py:385 (fixed_risk_sizing), risk_monitor.py:415
  * (StopLossManager).
  */
object ExtrasPack extends QueryPack {

  private def bars1m(s: SparkSession, d: String): DataFrame =
    Bars.ohlcv(Tables.ticks(s, d), 60)

  /** EMA via a bounded 60-tap window: a rank-range self-join weighted by
    * (1-α)^lag, normalized — the set-level form of pandas ewm(span)
    * (adjusted weights, truncated where weights < 1e-6; exact-infinite
    * EWM is streaming state, not a set operator).
    */
  private def emaCols(bars: DataFrame, spans: Seq[Int], taps: Int = 60): DataFrame = {
    val rnb = Signals.withRn(bars).select("symbol", "bucket_ms", "rn", "close")
    val a = rnb.select(col("symbol"), col("rn"), col("bucket_ms"))
    val b = rnb.select(col("symbol").as("symbol2"), col("rn").as("rn2"), col("close").as("close2"))
    val joined = a.join(b,
      col("symbol") === col("symbol2") &&
        col("rn2") <= col("rn") && col("rn2") > col("rn") - taps)
      .withColumn("lag", col("rn") - col("rn2"))
    val aggs = spans.map { span =>
      val alpha = 2.0 / (span + 1)
      val w = pow(lit(1.0 - alpha), col("lag"))
      (sum(w * col("close2")) / sum(w)).as(s"ema$span")
    }
    joined.groupBy("symbol", "bucket_ms", "rn").agg(aggs.head, aggs.tail: _*)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_signal_buy_hold" -> ((s, d) =>
      Signals.withRn(bars1m(s, d))
        .select(col("symbol"), col("bucket_ms"), col("close"), lit(1).as("signal"))
        .orderBy("symbol", "bucket_ms")),
    "q_signal_ensemble" -> ((s, d) => {
      val base = bars1m(s, d)
      val parts = Seq(
        Signals.maCross(base).select(col("symbol"), col("bucket_ms"), col("signal").as("s1")),
        Signals.meanReversion(base).select(col("symbol"), col("bucket_ms"), col("signal").as("s2")),
        Signals.momentum(base).select(col("symbol"), col("bucket_ms"), col("signal").as("s3")))
      parts.reduce(_.join(_, Seq("symbol", "bucket_ms")))
        .withColumn("vote", col("s1") + col("s2") + col("s3"))
        .withColumn("signal",
          when(col("vote") >= 2, 1).when(col("vote") <= -2, -1).otherwise(0))
        .select("symbol", "bucket_ms", "s1", "s2", "s3", "signal")
        .orderBy("symbol", "bucket_ms")
    }),
    "q_ema_macd" -> ((s, d) =>
      emaCols(bars1m(s, d), Seq(12, 26))
        .withColumn("macd", Port.r(col("ema12") - col("ema26"), 6))
        .select(col("symbol"), col("bucket_ms"),
          Port.r(col("ema12"), 6).as("ema12"),
          Port.r(col("ema26"), 6).as("ema26"), col("macd"))
        .orderBy("symbol", "bucket_ms")),
    "q_trailing_stops" -> ((s, d) =>
      // rows-only: the trailing state is path-dependent (typed per-symbol
      // scan); StopLossSpec pins the invariants
      StopLoss.run(Signals.maCross(bars1m(s, d))).toDF()
        .orderBy("symbol", "entry_ms")),
    "q_fixed_risk_sizing" -> ((s, d) => {
      // per symbol, every 100th bar: entry = close, stop = 1-min low of that
      // bar, 2% account risk, 25% max position (risk_monitor.py:385)
      val pv = 1000000.0
      Signals.withRn(bars1m(s, d))
        .filter(col("rn") % 100 === 0)
        .select(col("symbol"), col("bucket_ms"), col("close").as("entry"),
          col("low").as("stop"))
        .withColumn("price_risk", col("entry") - col("stop"))
        .withColumn("position_size",
          Port.r(when(col("price_risk") === 0, 0.0)
            .otherwise(least(lit(pv * 0.02) / col("price_risk"),
              lit(pv * 0.25) / col("entry"))), 4))
        .orderBy("symbol", "bucket_ms")
    })
  )

  private def emaAggSql(span: Int): String = {
    val alpha = 2.0 / (span + 1)
    s"sum(pow(1.0 - $alpha, lag) * close2) / sum(pow(1.0 - $alpha, lag))"
  }

  def oracles: Map[String, String] = Map(
    "q_signal_buy_hold" ->
      s"""WITH ${QueryPack.BarsCte}
         |SELECT symbol, bucket_ms, close, 1 AS signal
         |FROM bars ORDER BY symbol, bucket_ms""".stripMargin,
    "q_signal_ensemble" ->
      s"""WITH ${QueryPack.BarsCte},
         |sig AS (
         |  SELECT symbol, bucket_ms,
         |         row_number() OVER w AS rn,
         |         avg(close) OVER (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS fast_ma,
         |         avg(close) OVER (w ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) AS slow_ma,
         |         avg(close) OVER (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS mu20,
         |         stddev_samp(close) OVER (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS sd20,
         |         lag(close, 20) OVER w AS lag20, close
         |  FROM bars WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ms)
         |),
         |votes AS (
         |  SELECT symbol, bucket_ms,
         |         CASE WHEN rn >= 50 AND fast_ma > slow_ma THEN 1 ELSE 0 END AS s1,
         |         CASE WHEN rn < 20 THEN 0
         |              WHEN (close - mu20) / sd20 < -2.0 THEN 1
         |              WHEN (close - mu20) / sd20 > 2.0 THEN -1 ELSE 0 END AS s2,
         |         CASE WHEN rn <= 20 THEN 0
         |              WHEN close / lag20 - 1 > 0.02 THEN 1
         |              WHEN close / lag20 - 1 < -0.02 THEN -1 ELSE 0 END AS s3
         |  FROM sig
         |)
         |SELECT symbol, bucket_ms, s1, s2, s3,
         |       CASE WHEN s1 + s2 + s3 >= 2 THEN 1
         |            WHEN s1 + s2 + s3 <= -2 THEN -1 ELSE 0 END AS signal
         |FROM votes ORDER BY symbol, bucket_ms""".stripMargin,
    "q_ema_macd" ->
      s"""WITH ${QueryPack.BarsCte},
         |rnb AS (SELECT symbol, bucket_ms, close,
         |               row_number() OVER (PARTITION BY symbol ORDER BY bucket_ms) AS rn
         |        FROM bars),
         |joined AS (
         |  SELECT a.symbol, a.bucket_ms, a.rn, a.rn - b.rn AS lag, b.close AS close2
         |  FROM rnb a JOIN rnb b
         |    ON a.symbol = b.symbol AND b.rn <= a.rn AND b.rn > a.rn - 60
         |),
         |emas AS (
         |  SELECT symbol, bucket_ms, rn,
         |         ${emaAggSql(12)} AS ema12,
         |         ${emaAggSql(26)} AS ema26
         |  FROM joined GROUP BY symbol, bucket_ms, rn
         |)
         |SELECT symbol, bucket_ms,
         |       floor(ema12 * 1e6 + 0.5) / 1e6 AS ema12,
         |       floor(ema26 * 1e6 + 0.5) / 1e6 AS ema26,
         |       floor((ema12 - ema26) * 1e6 + 0.5) / 1e6 AS macd
         |FROM emas ORDER BY symbol, bucket_ms""".stripMargin,
    "q_fixed_risk_sizing" ->
      s"""WITH ${QueryPack.BarsCte},
         |rnb AS (SELECT *, row_number() OVER (PARTITION BY symbol ORDER BY bucket_ms) AS rn
         |        FROM bars)
         |SELECT symbol, bucket_ms, close AS entry, low AS stop,
         |       close - low AS price_risk,
         |       floor((CASE WHEN close - low = 0 THEN 0.0
         |              ELSE least(1000000.0 * 0.02 / (close - low),
         |                         1000000.0 * 0.25 / close) END) * 1e4 + 0.5) / 1e4 AS position_size
         |FROM rnb WHERE rn % 100 = 0 ORDER BY symbol, bucket_ms""".stripMargin
  )
}
