package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** File-format ingestion for tick feeds.
  *
  * Reference: data_processing/tick_to_ohlcv.py:140 convert_file /
  * benchmark_loader.py (csv+parquet paths). An explicit schema keeps CSV
  * reads single-pass (no inference scan) and keeps types identical across
  * formats, so every downstream operator is format-agnostic.
  */
object FileSource {

  val TickSchema: StructType = StructType(Seq(
    StructField("ts_ms", LongType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("price", DoubleType, nullable = false),
    StructField("volume", DoubleType, nullable = false)))

  def readTicksCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(TickSchema).option("header", "true").csv(path)

  def readTicksJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(TickSchema).json(path)

  def readTicksParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def writeTicksCsv(ticks: DataFrame, path: String): Unit =
    ticks.write.option("header", "true").mode("overwrite").csv(path)

  def writeTicksJson(ticks: DataFrame, path: String): Unit =
    ticks.write.mode("overwrite").json(path)
}
