package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard writer: the physical write path behind
  * operators.CorpusPack's q_shard_manifest (which emits the manifest a
  * loader validates against this layout).
  *
  * Layout contract: doc -> shard by the portable md5-first-14-hex
  * integer of its id (content-independent, stable under any input
  * partitioning, identical to the manifest's assignment), one directory
  * per shard, rows inside a shard written in (h, doc_id) order so a
  * loader streams a deterministic sequence without sorting. The whole
  * write is ONE shuffle: repartition on the shard column co-locates
  * each shard, sortWithinPartitions orders it, and the dynamic
  * partitionBy splits directories without a second exchange.
  */
object ShardWriter {

  /** docs: any frame with a doc_id column; written as `path/shard=K/`. */
  def writeShards(docs: DataFrame, path: String, nShards: Int = 64): Unit =
    docs
      .withColumn("h",
        conv(substring(md5(col("doc_id").cast("string")), 1, 14), 16, 10).cast("long"))
      .withColumn("shard", col("h") % nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "h", "doc_id")
      .write
      .partitionBy("shard")
      .mode("overwrite")
      .parquet(path)

  /** One shard's deterministic document stream (directory-pruned scan). */
  def readShard(spark: SparkSession, path: String, shard: Long): DataFrame =
    spark.read.parquet(path).filter(col("shard") === shard)
}
