package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-data cleaning: outlier removal, dedup, validation, gap fill.
  *
  * Reference: data_processing/cleaner.py (DataCleaner). Spark shapes:
  * per-symbol statistics come from one aggregate that is broadcast back
  * onto the feed (two narrow shuffles total, no per-row Python); the gap
  * fill builds the minute spine with `sequence`+`explode` so the spine is
  * generated distributed, never collected.
  */
object Cleaner {

  /** Per-symbol IQR bounds (cleaner.py:21, method="iqr"); exact
    * interpolated percentiles, threshold × IQR beyond the quartiles.
    */
  def iqrBounds(ticks: DataFrame, threshold: Double = 3.0): DataFrame =
    ticks
      .groupBy("symbol")
      .agg(percentile(col("price"), array(lit(0.25), lit(0.75))).as("qs"))
      .select(
        col("symbol"),
        element_at(col("qs"), 1).as("q1"),
        element_at(col("qs"), 2).as("q3"))
      .select(
        col("symbol"),
        (col("q1") - (col("q3") - col("q1")) * threshold).as("lo"),
        (col("q3") + (col("q3") - col("q1")) * threshold).as("hi")
      )

  /** Filter ticks outside per-symbol IQR bounds; bounds side is tiny and
    * broadcast.
    */
  def removeOutliersIqr(ticks: DataFrame, threshold: Double = 3.0): DataFrame = {
    val bounds = iqrBounds(ticks, threshold)
    ticks
      .join(broadcast(bounds), "symbol")
      .filter(col("price") >= col("lo") && col("price") <= col("hi"))
      .drop("lo", "hi")
  }

  /** Filter ticks with per-symbol |z| >= threshold removed
    * (cleaner.py:21, method="zscore"; sample stddev like pandas .std()).
    */
  def removeOutliersZscore(ticks: DataFrame, threshold: Double = 3.0): DataFrame = {
    val stats = ticks.groupBy("symbol")
      .agg(avg(col("price")).as("mu"), stddev_samp(col("price")).as("sd"))
    ticks
      .join(broadcast(stats), "symbol")
      .filter(abs(col("price") - col("mu")) / col("sd") < threshold)
      .drop("mu", "sd")
  }

  /** Keep the earliest record per duplicate key (cleaner.py:123,
    * keep="first"): one hash aggregate, no sort.
    */
  def dedupKeepFirst(ticks: DataFrame): DataFrame =
    ticks
      .groupBy(col("user_id"), col("symbol"))
      .agg(
        // ms precision: DuckDB truncates parquet ns timestamps to µs, so
        // raw ns longs can never hash-match across engines.
        expr("min(ts) div 1000000").as("first_ts_ms"),
        min_by(col("price"), col("ts")).as("first_price"),
        count(lit(1)).as("n_dups")
      )

  /** Valid/invalid price partition counts (cleaner.py:215). */
  def validatePrices(ticks: DataFrame, minPrice: Double, maxPrice: Double): DataFrame =
    ticks
      .groupBy("symbol")
      .agg(
        sum(when(col("price") >= minPrice && col("price") <= maxPrice, 1L).otherwise(0L)).as("valid_count"),
        sum(when(col("price") < minPrice || col("price") > maxPrice, 1L).otherwise(0L)).as("invalid_count"),
        count(lit(1)).as("total")
      )

  /** Minute spine per symbol with forward-filled close (cleaner.py:171,
    * method="ffill"). The spine generates distributed via
    * sequence+explode; the fill is a per-symbol `last(ignoreNulls)`
    * running window — no driver-side reindex.
    */
  def fillMissingMinutes(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("bucket_ms")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spineJoin(bars)
      .select(
        col("symbol"),
        col("bucket_ms"),
        last(col("close"), ignoreNulls = true).over(w).as("close_ffill"),
        col("close").isNull.cast("int").as("was_missing")
      )
  }

  /** Backward fill (cleaner.py:171, method="bfill"): next known close
    * looking forward. Implemented as last-ignore-nulls over a DESCENDING
    * running frame — Spark's unbounded-PRECEDING frame is a running O(n)
    * accumulator, while an unbounded-FOLLOWING frame rescans the tail per
    * row (O(n²) per partition; measured hang on the minute spine).
    */
  def fillMissingBfill(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy(col("bucket_ms").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spineJoin(bars)
      .select(
        col("symbol"),
        col("bucket_ms"),
        last(col("close"), ignoreNulls = true).over(w).as("close_bfill"),
        col("close").isNull.cast("int").as("was_missing")
      )
  }

  /** Time-linear interpolation (cleaner.py:171, method="interpolate" →
    * pandas interpolate(method="time")): gaps take
    * prev + (next − prev) · (t − t_prev)/(t_next − t_prev). Bracketing
    * values come from two running windows (last/first ignore-nulls), so
    * the fill is one shuffle — no per-gap join.
    */
  def fillMissingInterp(bars: DataFrame): DataFrame = {
    val wb = Window.partitionBy("symbol").orderBy("bucket_ms")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // "next" bracket via the DESCENDING running frame (see fillMissingBfill)
    val wf = Window.partitionBy("symbol").orderBy(col("bucket_ms").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spineJoin(bars)
      .withColumn("pv", last(col("close"), ignoreNulls = true).over(wb))
      .withColumn("pt", last(when(col("close").isNotNull, col("bucket_ms")), ignoreNulls = true).over(wb))
      .withColumn("nv", last(col("close"), ignoreNulls = true).over(wf))
      .withColumn("nt", last(when(col("close").isNotNull, col("bucket_ms")), ignoreNulls = true).over(wf))
      .select(
        col("symbol"),
        col("bucket_ms"),
        graft.functions.Port.r(
          when(col("close").isNotNull, col("close")).otherwise(
            col("pv") + (col("nv") - col("pv")) *
              (col("bucket_ms") - col("pt")).cast("double") /
              (col("nt") - col("pt")).cast("double")), 6).as("close_interp"),
        col("close").isNull.cast("int").as("was_missing")
      )
  }

  /** Distributed minute spine (sequence+explode, never collected) left
    * joined with the known bars. Generated in two levels — days, then
    * minutes within each day — so no task ever materializes more than a
    * 1440-element array: a flat sequence(lo, hi) builds one array per
    * symbol, which for a multi-year symbol is millions of elements in a
    * single task's heap.
    */
  private def spineJoin(bars: DataFrame): DataFrame =
    bars
      .groupBy("symbol")
      .agg(min("bucket_ms").as("lo"), max("bucket_ms").as("hi"))
      .select(col("symbol"), col("lo"), col("hi"),
        explode(sequence(expr("lo div 86400000"), expr("hi div 86400000"))).as("day"))
      .select(col("symbol"),
        explode(sequence(
          greatest(col("lo"), col("day") * 86400000L),
          least(col("hi"), col("day") * 86400000L + 86340000L),
          lit(60000L))).as("bucket_ms"))
      .join(bars.select("symbol", "bucket_ms", "close"), Seq("symbol", "bucket_ms"), "left")
}
