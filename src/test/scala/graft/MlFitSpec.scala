package graft

import graft.backtest.{BacktestPack, MlFit}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the MLlib walk-forward fit analog (ml_strategy.py:412
  * train_model / :437 walk_forward_validation): planted-signal
  * recovery, run-to-run coefficient determinism, and fold-boundary
  * parity with the oracled q_walk_forward_folds.
  */
class MlFitSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Synthetic feature frame where ONLY rsi carries the label: rsi > 50
    * ⇔ positive forward return. Every other feature is CONSTANT — zero
    * variance means the fit must put exactly zero weight on it, so the
    * dominance assertion cannot be confounded by raw-scale coefficient
    * inflation on a small-variance column.
    */
  private def planted(n: Int): DataFrame =
    (1 to n).map { i =>
      val rsi = if (i % 2 == 0) 70.0 else 30.0
      val fwd = if (rsi > 50) 0.01 else -0.01
      (0.001, 0.002, rsi, 1.2, 0.8, 1.1, 0.9, 1.0, 0.01, fwd)
    }.toDF("returns_1d", "returns_5d", "rsi", "bb_upper", "bb_lower",
      "sma_fast", "sma_slow", "volume_sma_ratio", "volatility", "fwd")

  test("planted separable signal is recovered: AUC ~ 1, rsi coefficient dominates") {
    val df = planted(400)
    val model = MlFit.fitLogistic(MlFit.trainingFrame(df))
    val aucTrain = MlFit.auc(model, MlFit.trainingFrame(df))
    assert(aucTrain >= 0.99, s"planted AUC $aucTrain")
    val coefs = model.coefficients.toArray.map(math.abs)
    val rsiIdx = 2 // FeatureCols.indexOf("rsi")
    assert(coefs(rsiIdx) > 0.0, s"rsi weight missing: ${coefs.mkString(",")}")
    coefs.zipWithIndex.filter(_._2 != rsiIdx).foreach { case (c, i) =>
      assert(c == 0.0, s"constant feature $i got nonzero weight $c")
    }
  }

  test("fit is deterministic run-to-run (fixed init, convex loss)") {
    val df = MlFit.trainingFrame(planted(300))
    val c1 = MlFit.fitLogistic(df).coefficients.toArray
    val c2 = MlFit.fitLogistic(df).coefficients.toArray
    assert(c1.sameElements(c2), "coefficients changed between identical fits")
  }

  test("walk-forward fold boundaries match q_walk_forward_folds; AUCs are sane") {
    // sf0.001 has too few bars for any 252-bar fold — the fold-bearing
    // scale is sf0.01 (the driver's correctness scale)
    val d = "/root/testdata/sf0.01"
    val folds = BacktestPack.queries("q_walk_forward_folds")(spark, d)
    val sym = folds.select("symbol").orderBy("symbol").head().getString(0)
    val expected = folds.filter(col("symbol") === sym)
      .select("symbol", "split_id", "train_size", "test_start_rn", "test_end_rn")
      .collect().map(_.toSeq).toSet
    val wf = MlFit.walkForwardLogistic(spark, d, Some(sym))
    val got = wf.select("symbol", "split_id", "train_size", "test_start_rn", "test_end_rn")
      .collect().map(_.toSeq).toSet
    assert(got == expected, "fold boundaries diverged from q_walk_forward_folds")
    assert(wf.count() == 5)
    val aucs = wf.select("train_auc", "test_auc").collect()
    aucs.foreach { r =>
      val (tr, te) = (r.getDouble(0), r.getDouble(1))
      assert(!tr.isNaN && tr >= 0.0 && tr <= 1.0, s"train AUC $tr")
      assert(!te.isNaN && te >= 0.0 && te <= 1.0, s"test AUC $te")
    }
  }
}
