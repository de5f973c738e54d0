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
