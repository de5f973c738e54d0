package graft

import graft.backtest.Risk
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the production `varCvarApprox` against the exact `varCvar` on a
  * known distribution: approx_percentile (GK sketch) guarantees rank
  * error ≤ n/accuracy, so on n uniform-ish returns the VALUE error at the
  * tails is bounded by ~(rank error + 1 interpolation step)/n of the value
  * range. The exact form stays the oracled query; this spec is the
  * contract for swapping the approx form in at tick-scale history, where
  * the exact sort-based percentile would buffer a symbol's whole history
  * in one aggregation buffer.
  */
class RiskApproxSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** 20k synthetic bars for one symbol whose log-price walk is a
    * deterministic LCG — a known, fixed return distribution.
    */
  private def syntheticBars(n: Int) = {
    import spark.implicits._
    val m = 2147483648L
    (0 until n).scanLeft(("S", 0L, 100.0, 12345L)) { case ((sym, _, close, seed), i) =>
      val s2 = (seed * 1103515245L + 12345L) % m
      // uniform return in [-1%, +1%]
      val r = (s2.toDouble / m) * 0.02 - 0.01
      (sym, (i + 1) * 60000L, close * (1.0 + r), s2)
    }.map { case (sym, ms, close, _) => (sym, ms, close) }
      .toDF("symbol", "bucket_ms", "close")
  }

  test("approx VaR/CVaR tracks exact within the sketch's rank-error bound") {
    val bars = syntheticBars(20000).cache()
    try {
      val exact = Risk.varCvar(bars).collect().head
      val approx = Risk.varCvarApprox(bars, accuracy = 10000).collect().head
      // n = 20000, accuracy = 10000 → rank error ≤ 2; uniform returns on a
      // 0.02-wide support → ~1e-6 value per rank step; allow 100× slack
      // for interpolation-vs-sketch-midpoint differences at the tail.
      val tol = 1e-3
      assert(math.abs(exact.getAs[Double]("var_95") - approx.getAs[Double]("var_95")) < tol,
        s"var_95: exact=${exact.getAs[Double]("var_95")} approx=${approx.getAs[Double]("var_95")}")
      assert(math.abs(exact.getAs[Double]("var_99") - approx.getAs[Double]("var_99")) < tol,
        s"var_99: exact=${exact.getAs[Double]("var_99")} approx=${approx.getAs[Double]("var_99")}")
      // CVaR averages the tail mass below the (approx) VaR cut: a shifted
      // cut moves the mean of ~1000 tail values by at most the cut shift
      assert(math.abs(exact.getAs[Double]("cvar_95") - approx.getAs[Double]("cvar_95")) < tol,
        s"cvar_95: exact=${exact.getAs[Double]("cvar_95")} approx=${approx.getAs[Double]("cvar_95")}")
      // both see every return row
      assert(exact.getAs[Long]("n") === approx.getAs[Long]("n"))
    } finally bars.unpersist()
  }

  test("single-pass shape: exactly one exchange in the exact varCvar plan") {
    val bars = syntheticBars(2000)
    val plan = Risk.varCvar(bars).queryExecution.executedPlan.toString
    // the lag window, the percentile window, and the final aggregate must
    // share ONE hash-partitioning by symbol — the r06 form paid an extra
    // aggregate + broadcast-join re-scan of the returns
    val exchanges = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected 1 symbol exchange, got $exchanges:\n$plan")
  }
}
