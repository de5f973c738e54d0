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

  /** Shared DuckDB CTE: OHLCV bars at `sec` granularity over the tick view
    * (mirrors graft.operators.Bars.ohlcv(ticks, sec)).
    */
  def barsCteAt(sec: Long): String =
    TicksCte + s""",
      |bars AS (
      |  SELECT symbol,
      |         epoch_ns(ts) // ${sec * 1000000000L} * ${sec * 1000L} AS bucket_ms,""".stripMargin + """
      |         arg_min(price, ts) AS open,
      |         max(price) AS high,
      |         min(price) AS low,
      |         arg_max(price, ts) AS close,
      |         sum(volume) AS volume,
      |         count(*) AS n_trades
      |  FROM ticks GROUP BY symbol, 2
      |)""".stripMargin

  /** 1-minute bars (the default granularity most queries share). */
  val BarsCte: String = barsCteAt(60)
}
