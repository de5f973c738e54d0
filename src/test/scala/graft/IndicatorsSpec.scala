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
