package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Live tick → OHLCV bars as a Structured Streaming query.
  *
  * Reference: etl/websocket_client.py (LiveETL._handle_message →
  * normalize → batch write) + data_processing/tick_to_ohlcv.py run
  * continuously. The declarative plan is identical to the batch
  * operator (graft.operators.Bars) — watermarked event-time windows,
  * min_by/max_by open/close — so batch and streaming stay semantically
  * aligned (the kappa-architecture property the reference approximates
  * with its asyncio queue).
  */
object StreamingBars {

  /** @param ticks streaming DataFrame with ts:timestamp, symbol, price, volume
    * @param barSeconds bar width
    * @param watermark  allowed event-time lateness (late ticks beyond it drop)
    */
  def bars(ticks: DataFrame, barSeconds: Int = 60, watermark: String = "2 minutes"): DataFrame =
    ticks
      .withWatermark("ts", watermark)
      .groupBy(col("symbol"), window(col("ts"), s"$barSeconds seconds"))
      .agg(
        min_by(col("price"), col("ts")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("ts")).as("close"),
        sum(col("volume")).as("volume"),
        count(lit(1)).as("n_trades"))
      .select(col("symbol"), unix_millis(col("window.start")).as("bucket_ms"),
        col("open"), col("high"), col("low"), col("close"), col("volume"), col("n_trades"))
}
