package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** JDBC trade store: the direct re-expression of the reference's SQL
  * persistence path (etl/database_writer.py:95,110 batched writes;
  * :151,165 `get_latest_trades` served from the store).
  *
  * [[ParquetSink]] remains the cluster-scale default (partition pruning
  * beats a B-tree at 100 TB); this sink covers the deployments that
  * genuinely want an operational SQL store beside the lake. Scale shape:
  *   - writes go through Spark's JDBC batch writer — `batchSize` rows per
  *     INSERT batch per task, and the dataframe's partition count IS the
  *     writer parallelism (repartition before calling to match what the
  *     database can absorb; 100 executors hammering one postgres is a
  *     self-inflicted outage).
  *   - reads are single-partition unless `partitionColumn` bounds are
  *     passed — fine for the operational queries this serves (recent
  *     trades for a symbol), wrong for analytics: bulk-export to parquet
  *     instead of running analytics through JDBC.
  *   - `latestTrades` pushes the symbol predicate into the database
  *     (WHERE clause in the generated SQL, pinned by JdbcSinkSpec) so the
  *     store's (symbol, ts) index does the work, mirroring the
  *     reference's indexed query rather than scanning the table through
  *     the wire.
  */
object JdbcSink {

  /** trades: ts_ms, symbol, price, volume[, feed_seq] (Normalizer.trades
    * shape). `numWriters` bounds concurrent JDBC connections.
    */
  def writeTrades(trades: DataFrame, url: String, table: String,
                  mode: SaveMode = SaveMode.Append, numWriters: Int = 8,
                  batchSize: Int = 10000,
                  columnTypes: Option[String] = Some("symbol VARCHAR(64)")): Unit = {
    // String columns need an explicit SQL type on dialects that default
    // them to LOBs (Derby → CLOB), which can't take the pushed-down
    // symbol predicate — exactly the filter this store exists to index.
    val w = trades
      .repartition(numWriters)
      .write
      .mode(mode)
      .option("batchsize", batchSize.toLong)
    columnTypes.foreach(w.option("createTableColumnTypes", _))
    w.jdbc(url, table, new java.util.Properties)
  }

  def readTrades(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.jdbc(url, table, new java.util.Properties)

  /** Parallel range-partitioned read — the bulk-export shape (drain the
    * operational store into the lake): `numPartitions` tasks each issue a
    * WHERE range on `partitionColumn`, so the scan parallelism is bounded
    * and explicit instead of one connection dragging the whole table.
    * Bounds come from the store's min/max (a catalog statistic — pass
    * them; don't scan to learn them).
    */
  def readTradesPartitioned(spark: SparkSession, url: String, table: String,
                            lower: Long, upper: Long,
                            partitionColumn: String = "ts_ms",
                            numPartitions: Int = 8): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lower, upper, numPartitions,
      new java.util.Properties)

  /** Latest N trades for a symbol (database_writer.py:165): symbol
    * predicate pushed into the store's SQL, ordered newest-first.
    */
  def latestTrades(spark: SparkSession, url: String, table: String,
                   symbol: String, n: Int): DataFrame =
    readTrades(spark, url, table)
      .filter(col("symbol") === symbol)
      .orderBy(col("ts_ms").desc)
      .limit(n)
}
