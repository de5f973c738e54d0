package graft

import graft.operators.Vol
import org.scalatest.funsuite.AnyFunSuite

/** Volatility/liquidity operators: realized variance + bipower jump
  * decomposition, Amihud illiquidity, intraday seasonality, lead-lag
  * cross-correlation. Pins (1) hand-computed exact-integer moments on
  * planted corpora, (2) overnight exclusion (a single-tick day yields
  * no diffs row), and (3) perfect lead-lag recovery when one symbol's
  * diffs replay another's one hour later.
  */
class VolSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Write (event_id, ts-ns, user_id, symbol, price) rows as an events
    * table and return the dir (vol = 1 + user_id % 100).
    */
  private def corpus(name: String,
                     rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory(name).toString
    rows.map { case (id, ts, uid, sym, p) => (id, ts, uid, sym, p, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val DayNs = 86400000000000L

  test("realized vol: exact rv/bv moments, jump ratio formula, overnight excluded") {
    // day 0: prices 10.00, 10.02, 10.04, 11.04 -> diffs +2, +2, +100
    //   rv = 4 + 4 + 10000 = 10008; bv = |2*2| + |2*100| = 204
    // day 1: one tick only -> no within-day diff -> no output row
    val dir = corpus("rv", Seq(
      (0L, 1000000000L, 9L, "A", 10.00),
      (1L, 2000000000L, 9L, "A", 10.02),
      (2L, 3000000000L, 9L, "A", 10.04),
      (3L, 4000000000L, 9L, "A", 11.04),
      (4L, DayNs + 1000000000L, 9L, "A", 11.04)))
    val out = Vol.realizedVol(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("day") == 0L)
    assert(r.getAs[Long]("n_diffs") == 3L)
    assert(r.getAs[Long]("rv_cents2") == 10008L)
    assert(r.getAs[Long]("bv_cents2") == 204L)
    val expected = math.floor(math.max(
      1.0 - math.Pi / 2 * (204.0 / 10008.0), 0.0) * 1e6 + 0.5) / 1e6
    assert(r.getAs[Double]("jump_ratio") == expected)
  }

  test("amihud: per-day snapped ratios, exact cross-day mean") {
    // day 0: open 100.00 close 101.00, 2 ticks vol 10 each
    //   dollars = (10000 + 10100) * 10 = 201000 cents; |ret| = 0.01
    // day 1: flat single tick -> ratio 0
    val dir = corpus("amihud", Seq(
      (0L, 1000000000L, 9L, "A", 100.00),
      (1L, 2000000000L, 9L, "A", 101.00),
      (2L, DayNs + 1000000000L, 9L, "A", 101.00)))
    val r = Vol.amihud(spark, dir).collect().head
    assert(r.getAs[Long]("n_days") == 2L)
    val u0 = math.floor(math.abs(10100.0 / 10000.0 - 1) / 201000.0 * 1e15 + 0.5)
    val expected = math.floor(u0 / (2 * 1e6) * 1e6 + 0.5) / 1e6
    assert(r.getAs[Double]("amihud_e9") == expected)
  }

  test("intraday profile: volume shares and per-hour rv mass") {
    // hour 0: three ticks (diffs +2, -2 after the first), hour 1: one tick
    // vol 10 each -> shares 0.75 / 0.25; hour-1 tick's diff (-2) counts
    // in hour 1 (diff belongs to the arriving tick's hour)
    val dir = corpus("intraday", Seq(
      (0L, 1000000000L, 9L, "A", 10.00),
      (1L, 2000000000L, 9L, "A", 10.02),
      (2L, 3000000000L, 9L, "A", 10.00),
      (3L, 3600000000000L + 1000000000L, 9L, "A", 9.98)))
    val out = Vol.intradayProfile(spark, dir).collect()
      .map(r => r.getAs[Long]("hour_of_day") ->
        (r.getAs[Long]("n_ticks"), r.getAs[Long]("volume"),
          r.getAs[Long]("rv_cents2"), r.getAs[Double]("vol_share"))).toMap
    assert(out(0L) == ((3L, 30L, 8L, 0.75)))
    assert(out(1L) == ((1L, 10L, 4L, 0.25)))
  }

  test("markov transitions: perfect alternation yields only cross transitions at p = 1") {
    // minute closes alternate 50.01/49.99 -> states alternate +1/-1
    val rows = (0 until 24).map(i =>
      (i.toLong, i * 60000000000L, 9L, "A", if (i % 2 == 0) 50.01 else 49.99))
    val dir = corpus("markov", rows)
    val out = Vol.markovTransitions(spark, dir).collect()
      .map(r => (r.getAs[Int]("s_from"), r.getAs[Int]("s_to")) ->
        (r.getAs[Long]("n_trans"), r.getAs[Double]("p"))).toMap
    assert(out.keySet == Set((-1, 1), (1, -1)))
    assert(out((-1, 1))._2 == 1.0)
    assert(out((1, -1))._2 == 1.0)
    // 23 diffs -> 22 transitions split 11/11
    assert(out((-1, 1))._1 + out((1, -1))._1 == 22L)
  }

  test("runs test: perfect alternation maximizes runs with the hand z-score") {
    val rows = (0 until 24).map(i =>
      (i.toLong, i * 60000000000L, 9L, "A", if (i % 2 == 0) 50.01 else 49.99))
    val dir = corpus("runs", rows)
    val r = Vol.runsTest(spark, dir).collect().head
    // 23 diffs: -2 first (12 of -1, 11 of +1), all adjacent flips -> 23 runs
    val (nu, nd, nr) = (11.0, 12.0, 23.0)
    assert(r.getAs[Long]("n_up") == nu.toLong)
    assert(r.getAs[Long]("n_down") == nd.toLong)
    assert(r.getAs[Long]("n_runs") == nr.toLong)
    val m = 2.0 * nu * nd / (nu + nd) + 1.0
    val v = (2.0 * nu * nd * (2.0 * nu * nd - nu - nd)) /
      ((nu + nd) * (nu + nd) * (nu + nd - 1))
    val z = math.floor((nr - m) / math.sqrt(v) * 1e6 + 0.5) / 1e6
    assert(r.getAs[Double]("z_score") == z)
  }

  test("ou half-life: geometric decay toward a mean recovers slope -0.5 and half-life 1") {
    // deviations from 100.00 halve each minute: 64, 32, ..., 1 cents ->
    // y = -0.5 * (x - mean) exactly -> OLS slope -0.5, half-life
    // -ln2/ln(0.5) = 1 bar
    val devs = Seq(64, 32, 16, 8, 4, 2, 1)
    val rows = devs.zipWithIndex.map { case (dv, i) =>
      (i.toLong, i * 60000000000L, 9L, "A", 100.00 + dv / 100.0)
    }
    val dir = corpus("ou", rows)
    val r = Vol.ouHalfLife(spark, dir).collect().head
    assert(r.getAs[Long]("n_obs") == 6L)
    assert(r.getAs[Double]("slope") == -0.5)
    val expect = math.floor(-math.log(2.0) / math.log(1.0 - 0.5) * 1e4 + 0.5) / 1e4
    assert(r.getAs[Double]("half_life_bars") == expect)
  }

  test("underwater stretches recompose exactly from the drawdown series") {
    val dd = SparkEntry.queries("q_drawdown_series")(spark, TestSpark.Sf)
      .collect().map(r => (r.getAs[String]("symbol"), r.getAs[Long]("bucket_ms"),
        r.getAs[Double]("log_equity"), r.getAs[Double]("log_peak"),
        r.getAs[Double]("dd"))).sortBy(t => (t._1, t._2))
    val expect = dd.groupBy(_._1).toSeq.flatMap { case (sym, rows) =>
      var sid = 0L
      rows.map { case (_, ts, le, lp, d) =>
        val uw = le < lp
        if (!uw) sid += 1
        (sym, sid, ts, d, uw)
      }.filter(_._5).groupBy(t => (t._1, t._2)).map { case ((s2, id), rs) =>
        (s2, id, rs.length.toLong, rs.map(_._3).min, rs.map(_._3).max,
          rs.map(_._4).min)
      }
    }.toSet
    val got = SparkEntry.queries("q_underwater_stretches")(spark, TestSpark.Sf)
      .collect().map(r => (r.getAs[String]("symbol"), r.getAs[Long]("stretch_id"),
        r.getAs[Long]("n_bars"), r.getAs[Long]("ts_start"),
        r.getAs[Long]("ts_end"), r.getAs[Double]("trough_dd"))).toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("seasonality dow: weekday means from planted daily opens/closes") {
    // day 0 (Thursday, dow 4): open 100.00 close 101.00 -> +100 cents
    // day 1 (Friday, dow 5): open 101.00 close 100.50 -> -50 cents
    // day 7 (Thursday): open 100.00 close 100.20 -> +20 cents
    def t(day: Long, sec: Long) = day * DayNs + sec * 1000000000L
    val dir = corpus("dow", Seq(
      (0L, t(0, 1), 9L, "A", 100.00), (1L, t(0, 2), 9L, "A", 101.00),
      (2L, t(1, 1), 9L, "A", 101.00), (3L, t(1, 2), 9L, "A", 100.50),
      (4L, t(7, 1), 9L, "A", 100.00), (5L, t(7, 2), 9L, "A", 100.20)))
    val out = Vol.seasonalityDow(spark, dir).collect()
      .map(r => r.getAs[Long]("dow") ->
        (r.getAs[Long]("n_days"), r.getAs[Double]("avg_ret_cents"))).toMap
    assert(out(4L) == ((2L, 60.0))) // (100 + 20) / 2
    assert(out(5L) == ((1L, -50.0)))
  }

  test("event study: the spike minute dominates and its neighbors appear at the right offsets") {
    // one tick per minute, flat at 50.00 except a +1.00 spike at minute 30
    // (diff +100) and the -100 reversion at minute 31; all other diffs 0.
    // Top-10 by |dpc|: the two spike bars + 8 zero-diff ties (by time).
    val rows = (1 until 60).map { i =>
      val p = if (i == 30) 51.00 else 50.00
      (i.toLong, i * 60000000000L, 9L, "A", p)
    }
    val dir = corpus("evstudy", rows)
    val out = Vol.eventStudy(spark, dir).collect()
      .map(r => r.getAs[Long]("off") ->
        (r.getAs[Long]("n_obs"), r.getAs[Double]("avg_dpc"))).toMap
    // at off 0 the two spike bars (+100, -100) average to 0 with the
    // 8 zero ties -> avg 0; every offset cell must net to an integer
    // multiple of 100/n_obs
    assert(out.contains(0L))
    assert(out(0L)._2 == 0.0)
    // off = +1 sees the -100 reversion following the +100 spike
    assert(out(1L)._2 < 0.0)
    // off = -1 sees the +100 spike preceding the reversion
    assert(out(-1L)._2 > 0.0)
  }

  test("lead-lag: a symbol replaying another's diffs one hour later correlates at 1") {
    // A's hourly cent diffs: +2, -4, +6, -8, +10 (varied, non-constant);
    // B's diff at hour t equals A's at t-1 -> corr(B, A, lag=1) = 1.
    val aDiffs = Seq(2L, -4L, 6L, -8L, 10L)
    val aCents = aDiffs.scanLeft(10000L)(_ + _)            // hours 0..5
    val bCents = aDiffs.scanLeft(20000L)(_ + _)            // B shifted: diff at hour t+1 = A diff at t
    val rows =
      aCents.zipWithIndex.map { case (c, h) =>
        (h.toLong, h * 3600000000000L, 9L, "A", c / 100.0) } ++
      bCents.zipWithIndex.map { case (c, h) =>
        (100L + h, (h + 1) * 3600000000000L, 9L, "B", c / 100.0) }
    val dir = corpus("leadlag", rows)
    val out = Vol.leadLagCorr(spark, dir).collect()
      .map(r => (r.getAs[String]("symbol"), r.getAs[String]("symbol_lead"),
        r.getAs[Long]("lag")) -> (r.getAs[Long]("n_pairs"), r.getAs[Double]("xcorr")))
      .toMap
    // B at t vs A at t-1: pairs at hours 2..5 (B diffs exist hours 2..6,
    // A diffs hours 1..5) -> overlap where both defined
    val (n, c) = out(("B", "A", 1L))
    assert(n >= 3L)
    assert(c == 1.0)
    // and the real feed produces a full ordered-pair x lag grid
    val real = Vol.leadLagCorr(spark, TestSpark.Sf).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      val v = r.getAs[Double]("xcorr")
      assert(!v.isNaN && v >= -1.0 && v <= 1.0)
    }
  }

  test("return moments: exact power-sum fold equals the operator; flat pins 0") {
    // A: constant +10% returns -> zero variance -> skew/kurt pinned 0;
    // B: two unequal returns, expected values recomputed driver-side
    // with the SAME quantize-then-exact-integer fold
    val dir = corpus("moments", Seq(
      (0L, 0L, 9L, "A", 10.00), (1L, 60000000000L, 9L, "A", 11.00),
      (2L, 120000000000L, 9L, "A", 12.10),
      (3L, 0L, 9L, "B", 10.00), (4L, 60000000000L, 9L, "B", 12.00),
      (5L, 120000000000L, 9L, "B", 10.80)))
    val out = Vol.returnMoments(spark, dir).collect()
      .map(r => r.getAs[String]("symbol") -> r).toMap
    assert(out("A").getAs[Double]("skewness") == 0.0)
    assert(out("A").getAs[Double]("excess_kurtosis") == 0.0)
    assert(out("A").getAs[Double]("mean_ret") ==
      math.floor(0.1 * 1e8 + 0.5) / 1e8)
    // driver-side mini-oracle for B
    val xs = Seq(12.0 / 10.0 - 1, 10.8 / 12.0 - 1)
      .map(x => BigInt(math.floor(x * 1e2 + 0.5).toLong))
    val n = BigInt(xs.length)
    val (s1, s2, s3, s4) = (xs.sum, xs.map(x => x * x).sum,
      xs.map(x => x * x * x).sum, xs.map(x => x * x * x * x).sum)
    val a2 = n * s2 - s1 * s1
    val a3 = n * n * s3 - 3 * n * s2 * s1 + 2 * s1 * s1 * s1
    val a4 = n * n * n * s4 - 4 * n * n * s3 * s1 +
      6 * n * s2 * s1 * s1 - 3 * s1 * s1 * s1 * s1
    val skew = math.floor(a3.toDouble /
      (a2.toDouble * math.sqrt(a2.toDouble)) * 1e6 + 0.5) / 1e6
    val kurt = math.floor(
      (a4.toDouble / (a2.toDouble * a2.toDouble) - 3) * 1e6 + 0.5) / 1e6
    assert(out("B").getAs[Double]("skewness") == skew)
    assert(out("B").getAs[Double]("excess_kurtosis") == kurt)
    assert(out("B").getAs[Long]("n_rets") == 2L)
  }

  test("volume hhi: hand shares on a two-symbol day") {
    // A vol 10 (user 9), B vol 20 (user 19): T=30,
    // hhi = (100+400)/900 = 5/9, top = 2/3
    val dir = corpus("hhi", Seq(
      (0L, 0L, 9L, "A", 10.00),
      (1L, 1000000000L, 19L, "B", 10.00)))
    val out = Vol.volumeHhi(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_symbols") == 2L)
    assert(r.getAs[Long]("total_vol") == 30L)
    assert(r.getAs[Double]("hhi") == math.floor(500.0 / 900.0 * 1e6 + 0.5) / 1e6)
    assert(r.getAs[Double]("top_share") ==
      math.floor(20.0 / 30.0 * 1e6 + 0.5) / 1e6)
  }
}
