package graft

import org.scalatest.funsuite.AnyFunSuite

/** Config surface (VERDICT r15 task 6): defaults must be bit-identical
  * to the pre-config baked constants (the oracle gate proves that at
  * scale; here we pin a sample), and a non-default threshold must change
  * the output where it should — including through the session memos,
  * which GraftConfig.set invalidates.
  */
class GraftConfigSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("fromKeys parses reference-style dotted keys; unknown keys fail fast") {
    val c = GraftConfig.fromKeys(Map(
      "bars.dollar_bar_cents" -> "20000000",
      "backtesting.commission" -> "0.002",
      "events.funnel_stages" -> "signup, purchase",
      "data_processing.outlier_threshold" -> "2.5"))
    assert(c.dollarBarCents == 20000000L)
    assert(c.costRate == 0.002 + 0.0005)
    assert(c.funnelStages == Vector("signup", "purchase"))
    assert(c.outlierThreshold == 2.5)
    // untouched fields keep their defaults
    assert(c.volumeBarUnits == GraftConfig.default.volumeBarUnits)
    intercept[IllegalArgumentException] {
      GraftConfig.fromKeys(Map("bars.dolar_bar_cents" -> "1"))
    }
  }

  test("load round-trips a properties file") {
    val f = java.io.File.createTempFile("graft_cfg", ".properties")
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath,
      """# deployment overrides
        |bars.volume_bar_units = 4000
        |risk.max_position: 0.10
        |""".stripMargin)
    val c = GraftConfig.load(f.getAbsolutePath)
    assert(c.volumeBarUnits == 4000L)
    assert(c.maxPosition == 0.10)
    assert(c.dollarBarCents == GraftConfig.default.dollarBarCents)
  }

  test("a finer dollar-bar threshold refines the bar clock (and restores on exit)") {
    def nBars(): Long =
      SparkEntry.queries("q_dollar_bars")(spark, sf).count()
    // at sf0.001 the default $100k clock already collapses each symbol
    // to one bar, so the sensitive direction is FINER: 1/100th threshold
    // must cut more bars
    val atDefault = nBars()
    val atFine = GraftConfig.withConfig(
      GraftConfig.default.copy(dollarBarCents = GraftConfig.default.dollarBarCents / 100)) {
      nBars()
    }
    assert(atFine > atDefault,
      s"1/100th threshold must produce more bars ($atFine vs $atDefault)")
    // memo invalidation on restore: the default-config result comes back
    assert(nBars() == atDefault)
  }

  test("funnel stage list drives q_funnel schema and q_funnel_timing transitions") {
    val cols = GraftConfig.withConfig(
      GraftConfig.default.copy(funnelStages = Vector("signup", "purchase"))) {
      val f = SparkEntry.queries("q_funnel")(spark, sf)
      val t = SparkEntry.queries("q_funnel_timing")(spark, sf)
      (f.columns.toSeq, t.select("stage").collect().map(_.getString(0)).toSeq)
    }
    assert(cols._1 == Seq("n_signup", "n_purchase_after"))
    assert(cols._2.forall(_ == "1_signup_to_purchase"))
    // defaults restored: four stages again
    assert(SparkEntry.queries("q_funnel")(spark, sf).columns.toSeq ==
      Seq("n_signup", "n_view_after", "n_click_after", "n_purchase_after"))
  }

  test("tighter outlier threshold removes at least as many rows") {
    val ticks = Tables.ticks(spark, sf)
    val kept3 = graft.etl.Cleaner.removeOutliersZscore(ticks).count()
    val kept1 = GraftConfig.withConfig(
      GraftConfig.default.copy(outlierThreshold = 1.0)) {
      graft.etl.Cleaner.removeOutliersZscore(ticks).count()
    }
    assert(kept1 < kept3, s"z<=1.0 must drop more than z<=3.0 ($kept1 vs $kept3)")
  }
}
