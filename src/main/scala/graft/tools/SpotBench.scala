package graft.tools

import graft.{GraftSession, SparkEntry}

/** Targeted per-query bench for iterating on specific rows without the
  * full 190-query sweep: cold + N warm passes over the named queries
  * (comma-separated in arg 1, default = the r14 >2x-marginal set), on
  * the sf dir in arg 0. Prints one line per query: cold + sorted warm
  * times. Same measurement discipline as Bench (toRdd.count, fixed
  * order); no adjudication — this is an iteration loop, not a grade.
  */
object SpotBench {
  private val R14Weak = Seq(
    "q_dollar_bars", "q_volume_bars", "q_return_acf", "q_variance_ratio",
    "q_tfidf_topterms", "q_vwap_drift", "q_bigram_logprob",
    "q_strategy_comparison", "q_corpus_job_manifest", "q_market_job_summary",
    "q3_shipping_priority", "q10_returned_items", "q_vpin", "q_obv",
    "q_bpe_encode")

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(R14Weak)
    val warms = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.get("graft-spotbench")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    new java.io.File(d).listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach { f =>
        try spark.read.parquet(f.getPath).queryExecution.toRdd.count()
        catch { case _: Throwable => () }
      }
    def run(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, d).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    val cold = names.map(n => n -> run(n)).toMap
    val samples = names.map(n => n -> scala.collection.mutable.ArrayBuffer[Double]()).toMap
    for (_ <- 1 to warms) {
      System.gc(); Thread.sleep(1500)
      names.foreach(n => samples(n) += run(n))
    }
    names.foreach { n =>
      val w = samples(n).sorted
      println(f"SPOT $n%-26s cold=${cold(n)}%6.2f warm=[${w.map(v => f"$v%.2f").mkString(", ")}]")
    }
    spark.stop()
  }
}
