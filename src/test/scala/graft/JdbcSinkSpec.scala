package graft

import java.nio.file.Files
import graft.etl.Normalizer
import graft.sources.JdbcSink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JDBC store parity (reference etl/database_writer.py:95-165): write
  * the normalized trades through Spark's JDBC batch writer, read them
  * back, and serve latest-trades with the symbol predicate pushed into
  * the database — against embedded Derby (on the Spark classpath; the
  * production URL swaps in postgres/mysql, same code path).
  */
class JdbcSinkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("jdbc sink roundtrip + pushed-down latest-trades read") {
    val dir = Files.createTempDirectory("graft-jdbc").toString
    val url = s"jdbc:derby:$dir/tradedb;create=true"
    val trades = Normalizer.trades(Tables.events(spark, TestSpark.Sf))
      .select("ts_ms", "symbol", "price", "volume", "feed_seq")
    JdbcSink.writeTrades(trades, url, "trades", numWriters = 2)
    val back = JdbcSink.readTrades(spark, url, "trades")
    assert(back.count() == trades.count())
    // value roundtrip, not just row count: same per-symbol aggregate on
    // both sides (sums snapped — double roundtrips exactly through JDBC
    // DOUBLE, but agg order differs)
    def sums(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("symbol").agg(
          count(lit(1)).as("n"),
          sum(col("ts_ms")).as("ts_sum"),
          graft.functions.Port.r(sum(col("price")), 4).as("p_sum"))
        .orderBy("symbol").collect().toSeq
    assert(sums(back) == sums(trades))
    // the symbol predicate must reach the database as SQL (an index scan
    // there), not arrive as a post-scan Spark filter over the full table
    val filtered = back.filter(col("symbol") === "click")
    val scanMeta = filtered.queryExecution.executedPlan.toString
    assert(scanMeta.contains("PushedFilters:") && scanMeta.contains("symbol"),
      scanMeta.take(800))
    val latest = JdbcSink.latestTrades(spark, url, "trades", "click", 5).collect()
    assert(latest.length == 5)
    assert(latest.forall(_.getAs[String]("symbol") == "click"))
    assert(latest.map(_.getAs[Long]("ts_ms")).toSeq ==
      latest.map(_.getAs[Long]("ts_ms")).sorted.reverse.toSeq)
    // append mode is the reference's batched-writer semantics
    JdbcSink.writeTrades(trades.limit(10), url, "trades", numWriters = 1)
    assert(JdbcSink.readTrades(spark, url, "trades").count() == trades.count() + 10)
  }

  test("partitioned bulk-export read: bounded parallel ranges, same totals") {
    val dir = Files.createTempDirectory("graft-jdbc-part").toString
    val url = s"jdbc:derby:$dir/tradedb;create=true"
    val trades = Normalizer.trades(Tables.events(spark, TestSpark.Sf))
      .select("ts_ms", "symbol", "price", "volume")
    JdbcSink.writeTrades(trades, url, "trades", numWriters = 2)
    val bounds = trades.agg(min("ts_ms"), max("ts_ms")).collect()(0)
    val part = JdbcSink.readTradesPartitioned(spark, url, "trades",
      bounds.getLong(0), bounds.getLong(1) + 1, numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == trades.count())
    assert(part.agg(sum("ts_ms")).collect()(0).getLong(0) ==
      trades.agg(sum("ts_ms")).collect()(0).getLong(0))
  }
}
