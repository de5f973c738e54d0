package graft

import graft.operators.Micro
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Microstructure operators: information-driven bars, tick-rule flow,
  * Roll spread. Pins (1) the threshold-bar boundary semantics on a
  * hand-computed series, (2) the tick-rule carry-forward contract, (3)
  * Roll's estimator on a planted bid-ask bounce, and (4) exact parity of
  * the two-level chunked forms with flat single-window forms under an
  * artificially small chunk (hour) that forces many boundary links —
  * the decomposition proof the DuckDB mirror relies on.
  */
class MicroSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val HourNs = 3600000000000L

  /** (symbol, ts-seconds, price) → the intTicks column contract
    * (vol fixed at 10 units so dollar thresholds are easy to plant).
    */
  private def ticks(rows: Seq[(String, Long, Double)]): DataFrame =
    rows.zipWithIndex.map { case ((sym, sec, p), i) =>
      (sym, sec * 1000000000L, i.toLong, p, 10L,
        math.floor(p * 100 + 0.5).toLong)
    }.toDF("symbol", "ts", "event_id", "price", "vol", "cents")
      .withColumn("dollar_c", col("cents") * col("vol"))

  test("threshold bars: a tick belongs to the bar open when it arrives") {
    // dollar_c = 10 * cents; prices 5.00 → dollar_c 5000/tick.
    // threshold 12000: cum_prev 0, 5000, 10000, 15000, 20000
    //   → bar_id      0,    0,     0,     1,     1
    val t = ticks(Seq(("A", 1, 5.0), ("A", 2, 5.0), ("A", 3, 5.0),
      ("A", 4, 5.0), ("A", 5, 5.0)))
    val bars = Micro.thresholdBars(t, "dollar_c", 12000L).collect()
    assert(bars.map(r => (r.getAs[Long]("bar_id"), r.getAs[Long]("n_ticks"))).toSeq
      == Seq((0L, 3L), (1L, 2L)))
    val b0 = bars.head
    assert(b0.getAs[Long]("volume") == 30L)
    assert(b0.getAs[Long]("dollar_cents") == 15000L)
    assert(b0.getAs[Double]("open") == 5.0 && b0.getAs[Double]("close") == 5.0)
    assert(b0.getAs[Long]("ts_start") == 1000000000L)
    assert(b0.getAs[Long]("ts_end") == 3000000000L)
  }

  test("tick rule: upticks/downticks classify, flats carry, leading run defaults +1") {
    // prices: 10, 10, 11, 11, 10, 10 → signs: +1(lead), +1(lead/flat),
    //   +1(up), +1(carry), -1(down), -1(carry); vol 10 each, one hour
    val rows = Seq(("A", 1L, 10.0), ("A", 2L, 10.0), ("A", 3L, 11.0),
      ("A", 4L, 11.0), ("A", 5L, 10.0), ("A", 6L, 10.0))
    // drive through the public path by writing a temp parquet events table
    val dir = java.nio.file.Files.createTempDirectory("microspec").toString
    rows.zipWithIndex.map { case ((sym, sec, p), i) =>
      (i.toLong, sec * 1000000000L, 9L, sym, p, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Micro.tickRuleFlow(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    // vol = 1 + 9 % 100 = 10 per tick; 4 buy ticks, 2 sell ticks
    assert(r.getAs[Long]("buy_vol") == 40L)
    assert(r.getAs[Long]("sell_vol") == 20L)
    assert(r.getAs[Long]("n_ticks") == 6L)
    assert(math.abs(r.getAs[Double]("imbalance") - (20.0 / 60.0)) < 1e-12)
  }

  test("roll spread: planted bid-ask bounce is recovered exactly") {
    // mid 50.00, spread 2 cents: trades alternate 50.01 / 49.99.
    // Δp alternates ±2 cents; with mean≈0 the serial covariance is
    // −(4)·(n·s_xy-term) — hand-check on 8 ticks: dpc,dpn pairs all
    // (±2, ∓2) → sxy = −4·n, sx, sy ∈ {0, ±2} small; estimator
    // 2·√(−cov) ≈ 4 cents = 2·spread under deterministic alternation
    // (the i.i.d. assumption halves it; the pinned value is the exact
    // arithmetic, not the econometric interpretation).
    val rows = (0 until 8).map(i =>
      (0L + i, (i + 1) * 1000000000L, 9L, "A",
        if (i % 2 == 0) 50.01 else 49.99, ""))
    val dir = java.nio.file.Files.createTempDirectory("microspec2").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Micro.rollSpread(spark, dir).collect().head
    // n=8 ticks → 6 (dpc,dpn) pairs; dpc = -2,+2,-2,+2,-2,+2 (from tick 2)
    // pairs: sx = sum first 6 = 0? dpc seq: -2,2,-2,2,-2,2,-2 (7 diffs);
    // pairs (dpc_i, dpc_{i+1}) for i=1..6: sx = -2+2-2+2-2+2 = 0,
    // sy = 2-2+2-2+2-2 = 0, sxy = 6·(-4) = -24, n=6
    // cov = (6·(-24) - 0)/36 = -4 → spread = 2·√4 = 4 cents
    assert(r.getAs[Long]("n_pairs") == 6L)
    assert(r.getAs[Double]("cov_cents2") == -4.0)
    assert(r.getAs[Double]("roll_spread_cents") == 4.0)
  }

  test("vpin: single planted bucket reproduces the hand imbalance; real feed stays in [0,1]") {
    // same 6-tick corpus as the tick-rule test: signs +1 x4, -1 x2,
    // vol 10 each -> one volume bucket (60 < 2000), |B-S|/V = 20/60
    val rows = Seq(("A", 1L, 10.0), ("A", 2L, 10.0), ("A", 3L, 11.0),
      ("A", 4L, 11.0), ("A", 5L, 10.0), ("A", 6L, 10.0))
    val dir = java.nio.file.Files.createTempDirectory("vpin").toString
    import spark.implicits._
    rows.zipWithIndex.map { case ((sym, sec, p), i) =>
      (i.toLong, sec * 1000000000L, 9L, sym, p, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Micro.vpin(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Double]("imbalance") == math.floor(20.0 / 60.0 * 1e6 + 0.5) / 1e6)
    assert(r.head.getAs[Double]("vpin") == r.head.getAs[Double]("imbalance"))
    // real feed: every bucket's vpin is a valid trailing mean in [0, 1]
    val real = Micro.vpin(spark, TestSpark.Sf).collect()
    assert(real.nonEmpty)
    real.foreach { b =>
      val v = b.getAs[Double]("vpin")
      assert(v >= 0.0 && v <= 1.0)
    }
  }

  test("return acf: perfect alternation gives acf(1) = -1 and acf(2) = +1 exactly") {
    // one tick per minute, price alternating 50.01/49.99 -> minute-bar
    // closes alternate -> cent diffs alternate ±2 -> lag-1 partner is
    // exactly -x (Pearson -1), lag-2 partner exactly x (Pearson +1)
    import spark.implicits._
    val rows = (0 until 24).map(i =>
      (i.toLong, i * 60000000000L, 9L, "A", if (i % 2 == 0) 50.01 else 49.99, ""))
    val dir = java.nio.file.Files.createTempDirectory("acf").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Micro.returnAcf(spark, dir).collect()
      .map(r => r.getAs[Long]("lag") -> r.getAs[Double]("acf")).toMap
    assert(out(1L) == -1.0)
    assert(out(2L) == 1.0)
    assert(out(3L) == -1.0)
  }

  test("kyle lambda: planted exact linear impact recovers the slope with r2 = 1") {
    // vol = 1 + user_id % 100; plant vols 10/20/30 and cent moves 3*vol
    // on each tick after the first: x = +vol (all upticks), y = 3x exactly
    // -> lambda = 3, r2 = 1. Moments: sx=60 sy=180 sxy=4200 sxx=1400
    // syy=12600, n=3 -> num=1800 dxx=600 dyy=5400.
    val rows = Seq(
      (0L, 1000000000L, 9L, "A", 100.00, ""),   // base tick, dpc null
      (1L, 2000000000L, 9L, "A", 100.30, ""),   // vol 10, +30 cents
      (2L, 3000000000L, 19L, "A", 100.90, ""),  // vol 20, +60 cents
      (3L, 4000000000L, 29L, "A", 101.80, ""))  // vol 30, +90 cents
    val dir = java.nio.file.Files.createTempDirectory("kyle").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Micro.kyleLambda(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_ticks") == 3L)
    assert(r.head.getAs[Double]("kyle_lambda") == 3.0)
    assert(r.head.getAs[Double]("r2") == 1.0)
  }

  test("variance ratio: alternating closes give vr = 0 at even q; real feed well-formed") {
    // one tick per minute, closes alternate 50.01/49.99 -> cent diffs at
    // even lags are exactly 0 (same parity) -> Var(2) = Var(10) = 0 ->
    // VR(2) = VR(10) = 0; lag-5 diffs alternate +-2 -> VR(5) ~ 1/5.
    val rows = (0 until 24).map(i =>
      (i.toLong, i * 60000000000L, 9L, "A", if (i % 2 == 0) 50.01 else 49.99, ""))
    val dir = java.nio.file.Files.createTempDirectory("vr").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Micro.varianceRatio(spark, dir).collect()
      .map(r => r.getAs[Long]("q") -> r.getAs[Double]("vr")).toMap
    assert(out.keySet == Set(2L, 5L, 10L))
    assert(out(2L) == 0.0)
    assert(out(10L) == 0.0)
    assert(math.abs(out(5L) - 0.2) < 0.02)
    // real feed: every (symbol, q) present, vr finite and non-negative
    val real = Micro.varianceRatio(spark, TestSpark.Sf).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      val v = r.getAs[Double]("vr")
      assert(!v.isNaN && !v.isInfinite && v >= 0.0)
    }
  }

  test("hawkes intensity: base rate with no history, hand value at one tau gap") {
    // tick 0 at t=0 (no taps -> lambda = mu = 0.1), tick 1 exactly
    // tau = 30 s later (one tap exp(-1)), tick 2 another 30 s on
    // (taps exp(-1) + exp(-2))
    val rows = Seq(
      (0L, 0L, 9L, "A", 10.0, ""),
      (1L, 30000000000L, 9L, "A", 10.0, ""),
      (2L, 60000000000L, 9L, "A", 10.0, ""))
    val dir = java.nio.file.Files.createTempDirectory("hawkes").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Micro.hawkesIntensity(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("n_contrib"), r.getAs[Double]("intensity"))).toMap
    def lam(taps: Double*): Double = {
      val su = taps.map(x => math.floor(math.exp(x) * 1e6 + 0.5)).sum
      math.floor((0.1 + 0.5 * (su / 1e6)) * 1e6 + 0.5) / 1e6
    }
    assert(out(0L) == ((0L, 0.1)))
    assert(out(1L) == ((1L, lam(-1.0))))
    assert(out(2L) == ((2L, lam(-1.0, -2.0))))
  }

  test("price impact curve: size buckets separate planted small/large-trade moves") {
    // vol = 1 + uid % 100: uid 4 -> vol 5 (bucket 0), uid 94 -> vol 95
    // (bucket 9); small trades move 2 cents, large trades 10 cents
    val rows = Seq(
      (0L, 1000000000L, 4L, "A", 100.00, ""),
      (1L, 2000000000L, 4L, "A", 100.02, ""),
      (2L, 3000000000L, 94L, "A", 100.12, ""),
      (3L, 4000000000L, 4L, "A", 100.14, ""),
      (4L, 5000000000L, 94L, "A", 100.24, ""))
    val dir = java.nio.file.Files.createTempDirectory("impact").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Micro.priceImpactCurve(spark, dir).collect()
      .map(r => r.getAs[Long]("size_bucket") ->
        (r.getAs[Long]("n_ticks"), r.getAs[Double]("avg_abs_move_cents"))).toMap
    assert(out(0L) == ((2L, 2.0)))
    assert(out(9L) == ((2L, 10.0)))
  }

  test("cusum events: planted drift triggers at threshold; real feed matches a sequential fold") {
    // diffs +2 per tick with h=20 -> an event exactly every 10 diffs
    val rows = (0 until 31).map(i =>
      (i.toLong, (i + 1) * 1000000000L, 9L, "A", 10.00 + i * 0.02, ""))
    val dir = java.nio.file.Files.createTempDirectory("cusum").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Micro.cusumEvents(spark, dir).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Int]("direction") == 1)
      assert(r.getAs[Long]("s_cents") == 20L)
      assert(r.getAs[Long]("n_ticks") == 10L)
    }
    assert(out.map(_.getAs[Long]("event_id")).toSeq == Seq(10L, 20L, 30L))

    // real feed: the distributed scan equals a driver-side sequential fold
    val got = Micro.cusumEvents(spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[String]("symbol"), r.getAs[Long]("event_id"),
        r.getAs[Int]("direction"), r.getAs[Long]("s_cents"))).toSeq
    val ticks = Micro.intTicks(spark, TestSpark.Sf)
      .select("symbol", "ts", "event_id", "cents")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2, t._3))
    val expect = ticks.groupBy(_._1).toSeq.flatMap { case (sym, ts) =>
      var prev = Long.MinValue
      var sp = 0L; var sm = 0L
      ts.flatMap { case (_, _, eid, cents) =>
        if (prev == Long.MinValue) { prev = cents; None }
        else {
          val dpc = cents - prev; prev = cents
          sp = math.max(0L, sp + dpc); sm = math.min(0L, sm + dpc)
          if (sp >= 20L) { val e = (sym, eid, 1, sp); sp = 0; sm = 0; Some(e) }
          else if (sm <= -20L) { val e = (sym, eid, -1, sm); sp = 0; sm = 0; Some(e) }
          else None
        }
      }
    }
    assert(got.toSet == expect.toSet)
    assert(got.nonEmpty)
  }

  test("two-level chunked forms equal flat single-window forms under hour chunks") {
    val sf = TestSpark.Sf
    // flat references computed inline with plain per-symbol windows
    val w = Window.partitionBy("symbol").orderBy("ts", "event_id")
    val t = Micro.intTicks(spark, sf)

    // exclusive cumsum
    val flatCum = t.withColumn("cum_prev",
      coalesce(sum("dollar_c").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("symbol", "event_id", "cum_prev").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val chunkCum = Micro.exclCum(t, "dollar_c", HourNs)
      .select("symbol", "event_id", "cum_prev").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(chunkCum == flatCum)

    // tick-rule signs via the flat window
    val flatSign = t
      .withColumn("dpc", col("cents") - lag("cents", 1).over(w))
      .withColumn("raw_sign", when(col("dpc") > 0, 1).when(col("dpc") < 0, -1))
      .withColumn("sign", coalesce(
        last(col("raw_sign"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, 0)), lit(1)))
      .groupBy(col("symbol"), expr("ts div 3600000000000 * 3600000").as("bucket_ms"))
      .agg(sum(when(col("sign") === 1, col("vol")).otherwise(0L)).as("buy_vol"),
        sum(when(col("sign") === -1, col("vol")).otherwise(0L)).as("sell_vol"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val chunkSign = Micro.tickRuleFlow(spark, sf, HourNs)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getAs[Long]("buy_vol"), r.getAs[Long]("sell_vol"))).toMap
    assert(chunkSign == flatSign)

    // roll diffs: flat (dpc, dpn) multiset per symbol
    val flatPairs = t
      .withColumn("dpc", col("cents") - lag("cents", 1).over(w))
      .withColumn("dpn", lead("dpc", 1).over(w))
      .filter(col("dpc").isNotNull && col("dpn").isNotNull)
      .groupBy("symbol").agg(count(lit(1)).as("n"), sum("dpc").as("sx"),
        sum(col("dpc") * col("dpn")).as("sxy"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val chunkRoll = Micro.rollSpread(spark, sf, HourNs)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_pairs")).toMap
    assert(chunkRoll == flatPairs.map { case (k, v) => k -> v._1 })
    // and day-chunk (production default) output equals hour-chunk output
    assert(Micro.rollSpread(spark, sf, HourNs).collect().toSeq ==
      Micro.rollSpread(spark, sf).collect().toSeq)
  }

  test("effective spread: strictly-previous quote midpoint, hand values") {
    // two ticks: the first has no earlier quote (excluded); the second
    // trades at 10.10 against the quote built from the first (10.00):
    // bid 9.99 / ask 10.01, mid their exact IEEE average
    val dir = java.nio.file.Files.createTempDirectory("effspread").toString
    Seq((0L, 1000000000L, 9L, "A", 10.00, ""),
      (1L, 2000000000L, 9L, "A", 10.10, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Micro.effectiveSpread(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("symbol") == "A")
    assert(r.getAs[Long]("bucket_ms") == 0L)
    assert(r.getAs[Long]("n_trades") == 1L)
    val mid = (10.00 * 0.999 + 10.00 * 1.001) / 2
    val effU = math.floor(math.abs(10.10 - mid) / mid * 1e4 * 1e6 + 0.5)
    assert(r.getAs[Double]("avg_eff_bps") == effU / 1e6)
    assert(r.getAs[Double]("buy_frac") == 1.0)
  }
}
