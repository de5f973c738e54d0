package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A bundle of named queries plus their DuckDB oracle SQL.
  *
  * Every operator the engine claims lives in exactly one pack; SparkEntry
  * concatenates them. Oracle SQL runs against DuckDB views named after the
  * parquet tables (region … lineitem, events, documents, embeddings).
  * Queries with no portable oracle (hash-function-dependent ops) appear in
  * `queries` only and get the driver's rows-only check.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}

object QueryPack {
  /** Shared DuckDB CTE: the tick view derived from `events`
    * (mirrors graft.Tables.ticks).
    */
  val TicksCte: String =
    """ticks AS (
      |  SELECT event_id, ts, event_type AS symbol, value AS price,
      |         CAST(1 + user_id % 100 AS DOUBLE) AS volume, user_id, props
      |  FROM events
      |)""".stripMargin

  /** Shared DuckDB CTE: 1-minute OHLCV bars over the tick view
    * (mirrors graft.operators.Bars.ohlcv(ticks, 60)).
    */
  val BarsCte: String =
    TicksCte + """,
      |bars AS (
      |  SELECT symbol,
      |         epoch_ns(ts) // 60000000000 * 60000 AS bucket_ms,
      |         arg_min(price, ts) AS open,
      |         max(price) AS high,
      |         min(price) AS low,
      |         arg_max(price, ts) AS close,
      |         sum(volume) AS volume,
      |         count(*) AS n_trades
      |  FROM ticks GROUP BY symbol, 2
      |)""".stripMargin
}
