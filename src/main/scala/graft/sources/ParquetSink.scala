package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable trade sink: (symbol, date)-partitioned parquet.
  *
  * Reference: etl/database_writer.py (batched asyncpg writer + index on
  * (symbol, timestamp)). The cluster-scale analog is a partitioned
  * columnar layout: the partition columns take the role of the index —
  * `readTrades` with a symbol/date filter prunes directories before any
  * IO, and writes are idempotent per partition (dynamic overwrite).
  */
object ParquetSink {

  /** trades: ts_ms, symbol, price, volume (Normalizer.trades shape). */
  def writeTrades(trades: DataFrame, path: String): Unit =
    trades
      .withColumn("date", to_date(timestamp_millis(col("ts_ms"))))
      .repartition(col("symbol"), col("date")) // one file per partition dir
      .write
      .partitionBy("symbol", "date")
      .mode("overwrite")
      .parquet(path)

  def readTrades(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Latest N trades per symbol, served off the partitioned layout
    * (database_writer.py:165 get_latest_trades).
    */
  def latestTrades(spark: SparkSession, path: String, symbol: String, n: Int): DataFrame =
    readTrades(spark, path)
      .filter(col("symbol") === symbol) // partition-pruned scan
      .orderBy(col("ts_ms").desc)
      .limit(n)
}
