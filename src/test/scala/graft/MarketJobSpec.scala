package graft

import graft.backtest.{Backtester, Metrics, Signals}
import graft.etl.Cleaner
import graft.sources.MarketJob
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed market pipeline (raw -> validate -> IQR clean -> bars
  * -> ma-cross backtest -> metrics manifest): the DuckDB oracle proves
  * engine parity of the whole chain; these pin the COMPOSITION — the
  * manifest must equal an independent stage-by-stage assembly from the
  * registered operators themselves.
  */
class MarketJobSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.Sf

  test("summary equals an independent stage-by-stage composition") {
    val got = MarketJob.summary(spark, d).collect()
      .map(r => r.getAs[String]("symbol") -> r).toMap

    // independent assembly: the registered operators, chained by hand
    val valid = Tables.ticks(spark, d)
      .select("symbol", "ts", "event_id", "price", "volume")
      .filter(col("price") >= 10.0 && col("price") <= 180.0)
    val clean = Cleaner.removeOutliersIqr(valid) // the q_clean_outliers_iqr operator
    val bars = graft.operators.Bars.ohlcv(clean, 60)
    val met = Metrics.compute(Backtester.run(Signals.maCrossPlain(bars)))
      .collect().map(r => r.getAs[String]("symbol") -> r).toMap
    val cleanN = clean.groupBy("symbol").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val barsN = bars.groupBy("symbol").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val rawN = Tables.ticks(spark, d).groupBy("symbol")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap

    assert(got.keySet == met.keySet)
    got.foreach { case (sym, row) =>
      assert(row.getAs[Long]("n_raw_ticks") == rawN(sym))
      assert(row.getAs[Long]("n_clean_ticks") == cleanN(sym))
      assert(row.getAs[Long]("n_bars") == barsN(sym))
      // funnel only removes rows, in order
      assert(row.getAs[Long]("n_clean_ticks") <= row.getAs[Long]("n_raw_ticks"))
      assert(row.getAs[Long]("n_bars") <= row.getAs[Long]("n_clean_ticks"))
      // every metric column matches the independent chain bit-for-bit
      met(sym).schema.fieldNames.filterNot(_ == "symbol").foreach { c =>
        val (a, b) = (row.getAs[Any](c), met(sym).getAs[Any](c))
        assert(a == b, s"$sym.$c: $a != $b")
      }
    }
    assert(got.nonEmpty)
  }
}
