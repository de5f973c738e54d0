package graft.sources

import graft.Tables
import graft.operators.Bars
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level batch resampling: read a raw tick archive, aggregate to
  * OHLCV at a target frequency, write a (symbol, date)-partitioned bar
  * layout — the composed read→resample→write job a user runs against a
  * historical archive.
  *
  * Reference: data_processing/resampler.py:138 (resample_file: one raw
  * file → one resampled file) and :187 (batch_resample: a directory of
  * files through a thread pool). The Spark-first shape replaces the
  * per-file loop entirely: one distributed read of the whole archive,
  * one shuffle into (symbol, bucket) bars, one partitioned write.
  * Parallelism comes from the cluster, each output partition directory
  * is the analog of one resampled file, and the dynamic-overwrite write
  * is idempotent per partition — re-runs and backfills replace in place.
  */
object BatchResample {

  /** Raw tick archive (`Tables.ticks` layout) → OHLCV bars at `seconds`,
    * written (symbol, date)-partitioned under `outPath`.
    */
  def resampleTicks(spark: SparkSession, inDir: String, outPath: String,
                    seconds: Long): Unit =
    writeBars(Bars.ohlcv(Tables.ticks(spark, inDir), seconds), outPath)

  /** resample_file for a raw normalized tick file (resampler.py:156-160
    * branches on the suffix): format dispatch goes through FileSource —
    * ONE explicit schema across csv/json/parquet, no inference scan (on
    * a 100 TB archive `inferSchema` is a silent second full pass) — then
    * one distributed read → OHLCV → partitioned-bar write regardless of
    * input format. FileSource ticks carry ts_ms; Bars buckets on the
    * epoch-ns `ts` contract, so the adapter widens exactly once here.
    */
  def resampleFile(spark: SparkSession, inPath: String, outPath: String,
                   seconds: Long): Unit = {
    val raw =
      if (inPath.endsWith(".csv") || inPath.endsWith(".csv.gz"))
        FileSource.readTicksCsv(spark, inPath)
      else if (inPath.endsWith(".json") || inPath.endsWith(".json.gz"))
        FileSource.readTicksJson(spark, inPath)
      else FileSource.readTicksParquet(spark, inPath)
    val ticks = raw.withColumn("ts", col("ts_ms") * 1000000L).drop("ts_ms")
    writeBars(Bars.ohlcv(ticks, seconds), outPath)
  }

  /** Existing bar layout → coarser bars (resampler.py:283
    * downsample_ohlcv as a batch job), preserving the partitioned layout.
    */
  def downsampleBars(spark: SparkSession, inPath: String, outPath: String,
                     seconds: Long): Unit =
    writeBars(Bars.downsample(readBars(spark, inPath), seconds), outPath)

  /** (symbol, date)-partitioned bar write; one file per partition dir. */
  def writeBars(bars: DataFrame, path: String): Unit =
    bars
      .withColumn("date", to_date(timestamp_millis(col("bucket_ms"))))
      .repartition(col("symbol"), col("date"))
      .write
      .partitionBy("symbol", "date")
      .mode("overwrite")
      .parquet(path)

  /** Partition-pruned bar reads: symbol/date filters cut directories
    * before any IO (asserted in BatchResampleSpec).
    */
  def readBars(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
