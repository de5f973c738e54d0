package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level per-symbol windowing: global row numbers, running prefix
  * sums, and bounded-lookback lags computed WITHOUT ever sorting one
  * symbol's full history in a single task — the 100 TB shape for the
  * fill/signal/backtest families, whose plain form partitions windows by
  * symbol alone and therefore serializes a symbol's entire stream through
  * one sort (SURVEY §6).
  *
  * Phase A ([[withRnAndPrefixSums]]): (symbol, day) chunk windows compute
  * intra-chunk row numbers and running sums; per-chunk totals (one row
  * per non-empty chunk) cumulate through a chunk-level window — #chunks
  * rows, not row-scale — and broadcast back as offsets. rn and every
  * prefix sum are then intra + offset. The offset association matches the
  * two-level equity curve in q_portfolio_multi_asset: sums differ from a
  * flat scan only by re-association (~n·ulp), far below any signal
  * comparison boundary.
  *
  * Phase B ([[withBoundedLags]]): bounded lags re-chunk by ROW COUNT
  * (cid = (rn−1) div C) so every chunk except the first has exactly C
  * rows; the last maxLag rows of each chunk are unioned into the next
  * chunk as ghost rows, each (symbol, cid) task sorts ≤ C + maxLag rows,
  * and lag(·, k) over the padded chunk equals the global per-symbol lag
  * for every real row (cid 0 has no ghosts — its early nulls are exactly
  * the global warmup nulls). Ghost values are exact copies, so lag
  * outputs are bit-identical to the plain window's.
  */
object ChunkedWindows {

  val DayMs = 86400000L
  val RowChunk = 4096

  /** Adds `rn` (global 1-based per-symbol row number) and one running
    * prefix-sum column per `sums` entry, all computed in (symbol, day)
    * chunk tasks. Input needs (symbol, bucket_ms).
    */
  def withRnAndPrefixSums(df: DataFrame, sums: Seq[(String, Column)],
                          chunkMs: Long = DayMs): DataFrame = {
    val wRn = Window.partitionBy("symbol", "_ck").orderBy("bucket_ms")
    val w2 = wRn.rowsBetween(Window.unboundedPreceding, 0)
    val wc = Window.partitionBy("symbol").orderBy("_ck")
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = df.withColumn("_ck", expr(s"bucket_ms div $chunkMs"))
    // window layering (r07): rn + every intra-chunk running sum in ONE
    // projection — one WindowExec per chunk task instead of one per sum
    val intra = base.select(col("*") +:
      row_number().over(wRn).as("_rnl") +:
      sums.map { case (n, c) => sum(c).over(w2).as(s"_l$n") }: _*)
    val totalAggs = count(lit(1)).as("_cnt") +:
      sums.map { case (n, c) => sum(c).as(s"_t$n") }
    val offs = base.groupBy(col("symbol"), col("_ck"))
      .agg(totalAggs.head, totalAggs.tail: _*)
      .select(col("symbol") +: col("_ck") +:
        (coalesce(sum(col("_cnt")).over(wc), lit(0L)).as("_ocnt") +:
          sums.map { case (n, _) =>
            coalesce(sum(col(s"_t$n")).over(wc), lit(0.0)).as(s"_o$n")
          }): _*)
    val joined = intra.join(offs, Seq("symbol", "_ck"))
      .withColumn("rn", (col("_rnl") + col("_ocnt")).cast("int"))
    sums.foldLeft(joined) { case (d, (n, _)) =>
      d.withColumn(n, col(s"_l$n") + col(s"_o$n"))
    }.drop(Seq("_ck", "_rnl", "_ocnt") ++
      sums.flatMap { case (n, _) => Seq(s"_l$n", s"_o$n") }: _*)
  }

  /** Adds `out` = lag(`src`, k) over the global per-symbol stream for each
    * (src, k, out) spec, computed in fixed-size row-chunk tasks with
    * ghost padding. Input needs `rn` (from [[withRnAndPrefixSums]]).
    */
  def withBoundedLags(df: DataFrame, lags: Seq[(String, Int, String)],
                      c: Int = RowChunk): DataFrame = {
    val maxLag = lags.map(_._2).max
    require(c >= maxLag, s"row chunk $c must cover the max lag $maxLag")
    val withCid = df.withColumn("_cid", expr(s"(rn - 1) div $c"))
    val ghosts = withCid.filter(expr(s"(rn - 1) % $c") >= c - maxLag)
      .withColumn("_cid", col("_cid") + 1)
      .withColumn("_ghost", lit(true))
    val padded = withCid.withColumn("_ghost", lit(false)).unionByName(ghosts)
    val w3 = Window.partitionBy("symbol", "_cid").orderBy("rn")
    // all bounded lags share one WindowExec (layering, r07)
    padded.select(col("*") +:
      lags.map { case (src, k, out) => lag(col(src), k).over(w3).as(out) }: _*)
      .filter(!col("_ghost")).drop("_cid", "_ghost")
  }
}
