package graft

import graft.operators.Indicators
import org.scalatest.funsuite.AnyFunSuite

/** Indicator operators: OBV, ATR, stochastic %K/%D. Pins hand-computed
  * values on planted bar/tick series and the flat-range %K=50 guard.
  */
class IndicatorsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(name: String,
                     rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory(name).toString
    rows.map { case (id, ts, uid, sym, p) => (id, ts, uid, sym, p, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("obv: running signed volume sampled at hour ends") {
    // prices 10, 11, 10, 12 (vol 10 each): signs +1(lead), +1, -1, +1
    // obv after each tick: 10, 20, 10, 20; hour 0 holds ticks 1-3
    // (obv ends 10+10-10=10), hour 1 holds tick 4 (obv 20)
    val dir = corpus("obv", Seq(
      (0L, 1000000000L, 9L, "A", 10.00),
      (1L, 2000000000L, 9L, "A", 11.00),
      (2L, 3000000000L, 9L, "A", 10.00),
      (3L, 3600000000000L + 1000000000L, 9L, "A", 12.00)))
    val out = Indicators.obv(spark, dir).collect()
      .map(r => r.getAs[Long]("bucket_ms") ->
        (r.getAs[Long]("obv"), r.getAs[Long]("n_ticks"))).toMap
    assert(out(0L) == ((10L, 3L)))
    assert(out(3600000L) == ((20L, 1L)))
  }

  test("atr: true range picks the largest of range and gap legs") {
    // one tick per minute -> h = l = c each bar; bars at 10.00, 10.50,
    // 10.10: TR(bar2) = |c2 - c1| = 50, TR(bar3) = 40; ATR(bar3) = 45
    val dir = corpus("atr", Seq(
      (0L, 0L, 9L, "A", 10.00),
      (1L, 60000000000L, 9L, "A", 10.50),
      (2L, 120000000000L, 9L, "A", 10.10)))
    val out = Indicators.atr(spark, dir).collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("tr_cents") == 50L)
    assert(out(0).getAs[Double]("atr_cents") == 50.0)
    assert(out(1).getAs[Long]("tr_cents") == 40L)
    assert(out(1).getAs[Double]("atr_cents") == 45.0)
  }

  test("williams %R: extremes and the flat-range -50 guard") {
    // bars 10.00, 10.00 (flat -> -50), 11.00 (at the high -> 0),
    // 10.00 (at the low -> -100)
    val dir = corpus("willr", Seq(
      (0L, 0L, 9L, "A", 10.00),
      (1L, 60000000000L, 9L, "A", 10.00),
      (2L, 120000000000L, 9L, "A", 11.00),
      (3L, 180000000000L, 9L, "A", 10.00)))
    val out = Indicators.williamsR(spark, dir).collect()
      .map(_.getAs[Double]("pct_r")).toSeq
    assert(out == Seq(-50.0, -50.0, 0.0, -100.0))
  }

  test("donchian: prior-window channel, full-lookback gate, breakout signs") {
    // bars 10, 11, 12, 9 with window=2: bar3's channel is bars(1,2) =
    // [10,11] -> close 12 breaks out +1; bar4's channel is bars(2,3) =
    // [11,12] -> close 9 breaks down -1; bars 1-2 have no full lookback
    val dir = corpus("donch", Seq(
      (0L, 0L, 9L, "A", 10.00),
      (1L, 60000000000L, 9L, "A", 11.00),
      (2L, 120000000000L, 9L, "A", 12.00),
      (3L, 180000000000L, 9L, "A", 9.00)))
    val out = Indicators.donchian(spark, dir, window = 2).collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("chan_upper") == 11.0)
    assert(out(0).getAs[Double]("chan_lower") == 10.0)
    assert(out(0).getAs[Double]("chan_mid") == 10.5)
    assert(out(0).getAs[Long]("breakout") == 1L)
    assert(math.abs(out(0).getAs[Double]("width_bps") -
      math.floor(100.0 * 20000 / 2100.0 * 1e6 + 0.5) / 1e6) < 1e-12)
    assert(out(1).getAs[Long]("breakout") == -1L)
    assert(out(1).getAs[Double]("chan_upper") == 12.0)
    assert(out(1).getAs[Double]("chan_lower") == 11.0)
  }

  test("pivot points: thirds-exact levels from the previous day's bar") {
    // day0: ticks 10.00 then 11.00 -> h=1100 l=1000 c=1100, T=3200;
    // day1 close 10.50: pivot=T/300, r1=(2T-3l)/300, s1=(2T-3h)/300,
    // r2=(T+3(h-l))/300, s2=(T-3(h-l))/300; 3c=3150 < T -> -1
    val day = 86400000000000L
    val dir = corpus("pivot", Seq(
      (0L, 0L, 9L, "A", 10.00),
      (1L, 1000000000L, 9L, "A", 11.00),
      (2L, day + 1000000000L, 9L, "A", 10.50)))
    val out = Indicators.pivotPoints(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Double]("pivot") == 3200 / 300.0)
    assert(r.getAs[Double]("r1") == (2 * 3200 - 3 * 1000) / 300.0)
    assert(r.getAs[Double]("s1") == (2 * 3200 - 3 * 1100) / 300.0)
    assert(r.getAs[Double]("r2") == (3200 + 300) / 300.0)
    assert(r.getAs[Double]("s2") == (3200 - 300) / 300.0)
    assert(r.getAs[Long]("close_vs_pivot") == -1L)
  }

  test("gap analysis: exact gap cents, bps, and the fill test") {
    // day0 closes 10.00; day1 opens 10.50 (gap +50), dips to 9.90
    // (fills), closes 10.20; day2 opens 10.00 vs prev close 10.20
    // (gap -20), high stays below 10.20 (unfilled)
    val day = 86400000000000L
    val dir = corpus("gap", Seq(
      (0L, 0L, 9L, "A", 10.00),
      (1L, day, 9L, "A", 10.50),
      (2L, day + 1000000000L, 9L, "A", 9.90),
      (3L, day + 2000000000L, 9L, "A", 10.20),
      (4L, 2 * day, 9L, "A", 10.00)))
    val out = Indicators.gapAnalysis(spark, dir).collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("gap_cents") == 50L)
    assert(out(0).getAs[Double]("gap_bps") ==
      math.floor(50.0 * 10000 / 1000.0 * 1e6 + 0.5) / 1e6)
    assert(out(0).getAs[Long]("filled") == 1L)
    assert(out(0).getAs[Long]("direction") == 1L)
    assert(out(1).getAs[Long]("gap_cents") == -20L)
    assert(out(1).getAs[Long]("filled") == 0L)
    assert(out(1).getAs[Long]("direction") == -1L)
  }

  test("vwap drift: bar vs day-running VWAP, exact cross-product ratio") {
    // minute0: 10.00 x vol 10 -> bar vwap 10, day vwap 10, drift 0
    // minute1: 20.00 x vol 10 -> bar vwap 20, day vwap 15,
    //   drift = (20000*20)/(10*30000) - 1 = 1/3 -> 3333.33 bps
    val dir = corpus("vwapdrift", Seq(
      (0L, 0L, 9L, "A", 10.00),
      (1L, 60000000000L, 9L, "A", 20.00)))
    val out = graft.operators.BarsPack.queries("q_vwap_drift")(spark, dir)
      .collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("vwap_bar") == 10.0)
    assert(out(0).getAs[Double]("vwap_day") == 10.0)
    assert(out(0).getAs[Double]("drift_bps") == 0.0)
    assert(out(1).getAs[Double]("vwap_bar") == 20.0)
    assert(out(1).getAs[Double]("vwap_day") == 15.0)
    assert(out(1).getAs[Double]("drift_bps") ==
      math.floor((20000.0 * 20 / (10.0 * 30000) - 1) * 1e4 * 1e6 + 0.5) / 1e6)
  }

  test("candle patterns: integer-exact doji, hammer, engulfing flags") {
    // bar1 (2 ticks 10.00, 10.01 -> o=1000 c=1001 h=1001 l=1000):
    //   body=1, range=1: not doji (10 > 1); hammer: lower shadow 0 < 2
    // bar2 (ticks 10.10, 10.30, 10.08 -> o=1010 h=1030 l=1008 c=1008):
    //   down body 2, range 22: doji (20 <= 22); not hammer (upper 20 > 2)
    // bar3 (ticks 10.05, 10.40 -> o=1005 c=1040, up body 35 engulfing
    //   bar2's down body [1008, 1010]): bull_engulf
    // bar4 (ticks 10.20, 10.21, 10.00 -> o=1020 h=1021 l=1000 c=1000):
    //   down body 20 >= prev up body? bear_engulf needs o>=pc(1040) -> no;
    //   hammer: lower shadow 0... body 20, lower shadow l-min(o,c)=0 -> no
    val dir = corpus("candle", Seq(
      (0L, 0L, 9L, "A", 10.00), (1L, 1000000000L, 9L, "A", 10.01),
      (2L, 60000000000L, 9L, "A", 10.10), (3L, 61000000000L, 9L, "A", 10.30),
      (4L, 62000000000L, 9L, "A", 10.08),
      (5L, 120000000000L, 9L, "A", 10.05), (6L, 121000000000L, 9L, "A", 10.40),
      (7L, 180000000000L, 9L, "A", 10.20), (8L, 181000000000L, 9L, "A", 10.21),
      (9L, 182000000000L, 9L, "A", 10.00)))
    val out = Indicators.candlePatterns(spark, dir).collect()
      .map(r => r.getAs[Long]("bucket_ms") ->
        (r.getAs[Long]("doji"), r.getAs[Long]("hammer"),
          r.getAs[Long]("bull_engulf"), r.getAs[Long]("bear_engulf"))).toMap
    assert(out(0L) == ((0L, 0L, 0L, 0L)), "bar1 matches nothing")
    assert(out(60000L) == ((1L, 0L, 0L, 0L)), "bar2 is a doji")
    assert(out(120000L)._3 == 1L, "bar3 bullish engulfing")
    assert(out(180000L) == ((0L, 0L, 0L, 0L)), "bar4 matches nothing")
  }

  test("stochastic: %K at range extremes and the flat-range 50 guard") {
    // bars: 10.00, 10.00 (flat so far -> %K=50), 11.00 (new high -> 100),
    // 10.00 (back at the low -> 0); %D = trailing-3 mean of %K
    val dir = corpus("stoch", Seq(
      (0L, 0L, 9L, "A", 10.00),
      (1L, 60000000000L, 9L, "A", 10.00),
      (2L, 120000000000L, 9L, "A", 11.00),
      (3L, 180000000000L, 9L, "A", 10.00)))
    val out = Indicators.stochastic(spark, dir).collect()
    val k = out.map(_.getAs[Double]("pct_k")).toSeq
    val dd = out.map(_.getAs[Double]("pct_d")).toSeq
    assert(k == Seq(50.0, 50.0, 100.0, 0.0))
    assert(dd(0) == 50.0)
    assert(dd(1) == 50.0)
    assert(math.abs(dd(2) - (50.0 + 50.0 + 100.0) / 3) < 1e-9)
    assert(dd(3) == 50.0) // (50 + 100 + 0) / 3
  }
}
