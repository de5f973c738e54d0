package graft

import graft.tools.ExplainAudit
import org.scalatest.funsuite.AnyFunSuite

/** Pins the executed-WindowExec count of the window-heavy queries at
  * their dependency-minimal layer counts. A withColumn inserted between
  * two window expressions blocks CollapseWindow and silently plans one
  * row-copying WindowExec PER expression (the r07 layering find:
  * q_strategy_comparison carried eleven over one sort before the fix) —
  * this spec makes that regression loud. Counts are measured on the
  * executed plan, descending AQE stages, excluding cached lineage.
  */
class WindowLayeringSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  // name -> max executed WindowExec operators (the dependency-layer
  // count; a frame feeding two plan branches may repeat its layer)
  private val pins = Seq(
    "q_backtest_ma_cross" -> 2, // signal layer + lag layer/equity cumsum (cached after first build)
    "q_strategy_comparison" -> 3, // lags -> equity cumsums -> running peaks
    "q_ml_features" -> 2, // lag/avg layer + derived layer
    "q_rolling_corr" -> 4, // ret lag + bucket avg + cum moments + k-lags
    "q_market_beta" -> 2, // ret lag + bucket avg (agg has no window)
    "q_drawdown_series" -> 2, // backtest cached; running peak + rn
    "q_perf_metrics" -> 1, // peak + prev-pos share one WindowExec
    "q_asof_join" -> 1, // every ignore-nulls fill in one operator
    "q_retention_cohorts" -> 2, // per-user cohort min + offset-0 size
    "q_train_test_split" -> 2, // rn + whole-partition depth count
    "q_sessionize" -> 2, // gap lag -> boundary cumsum (dependent)
    "q_funnel" -> 4, // four dependent per-user stage minima, one shuffle
    // bar-scale depth max + fold prefix-sum + final rank (the last two
    // run over the ~symbol×5 aggregate). At tiny SFs AQE's runtime
    // empty-propagation can erase the post-filter windows entirely, so
    // the measured count only ever shrinks below this structural pin.
    "q_feature_importance" -> 3,
    // r15 referee forms: approx VaR's exact side rides the memoized
    // stats frame; the sketch referee re-derives the returns lag in two
    // plan branches (approx agg + rank-count join-back). Approx DAU/WAU
    // adds the exact side's one first-activity lag; the HLL side stays
    // window-free (sketch aggregates only).
    "q_var_cvar_approx" -> 4,
    "q_dau_wau_approx" -> 1,
    // exact DAU/WAU: one lag over the user partition (first-touch
    // window emission) — the rewrite that removed the distinct agg
    "q_dau_wau" -> 1,
    // retrieval family (r10 fourth continuation): BM25 ranks via the
    // two-level top-k (local + global row_number); the hybrid adds the
    // lexical pair, the vector pair (bruteTopK) and the fused rank; the
    // kNN graph and purity moved to the same two-level rank in r12 (a
    // hot vector's pool partner list — bands x bucket cap, ~48k worst
    // case — must not sort in one task), so 2 windows each BY DESIGN
    "q_bm25_topk" -> 2,
    "q_rrf_hybrid" -> 5,
    "q_knn_graph" -> 2,
    "q_knn_purity" -> 2,
    // decile cumsum + whole-histogram total over the grid-bounded frame
    "q_quality_deciles" -> 2,
    // r10 late additions (r11 verdict task 5):
    // q_graph_rank reads the memoized PageRank frame — its top-3 rank
    // window ran at cache fill, so the query itself executes NONE;
    "q_graph_rank" -> 0,
    // triplet mining: bruteTopK's two-level rank (local + global) feeds
    // the pos and hard_neg branches — one uncached frame into two plan
    // branches repeats the pair;
    "q_triplet_mining" -> 4,
    // BPE pair table: one global rank over the (vocab-bounded,
    // aggregate-reduced) pair-count frame
    "q_bpe_pair_freqs" -> 1
  )

  test("executed plans stay at their dependency-minimal window layer counts") {
    val failures = pins.flatMap { case (name, maxWindows) =>
      val df = SparkEntry.queries(name)(spark, TestSpark.Sf)
      df.collect() // finalize AQE
      val got = ExplainAudit.countWindows(df.queryExecution.executedPlan)
      if (got > maxWindows) Some(s"$name: $got WindowExec (pin $maxWindows)")
      else None
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
