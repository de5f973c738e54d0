package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed fact-table layout for shuffle-free co-located joins.
  *
  * At 100 TB the orders⋈lineitem style joins dominate shuffle volume;
  * writing both sides bucketed (and sorted) by the join key lets
  * SortMergeJoin read co-located buckets with NO exchange on either side.
  * This is the persistent-layout counterpart to AQE's runtime re-planning.
  */
object BucketedTables {

  /** Write `df` as an external bucketed+sorted table at `path`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
