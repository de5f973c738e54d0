package graft

import org.scalatest.funsuite.AnyFunSuite

/** ADVICE r15 (Micro.scala:123): Dataset.unpersist is a no-op for
  * localCheckpoint-materialized memo frames — only the CacheManager is
  * consulted, not the RDD-level persistence the checkpoint installed.
  * Memo.release walks the LogicalRDD leaves and unpersists their RDDs;
  * this spec proves invalidateAll actually frees the blocks (before the
  * fix, the checkpointed RDDs stayed in getPersistentRDDs until GC).
  */
class MemoReleaseSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("invalidateAll frees checkpoint-materialized memo blocks") {
    Memo.invalidateAll()
    // give the (synchronous) unpersists a beat, then snapshot
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // fill several checkpoint-backed memos (bag-of-words, idf, cum ticks)
    SparkEntry.queries("q_tfidf_topterms")(spark, sf).count()
    SparkEntry.queries("q_dollar_bars")(spark, sf).count()
    val during = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(during.nonEmpty,
      "memo fill must persist checkpoint RDDs (otherwise this spec tests nothing)")
    Memo.invalidateAll()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    val leaked = during.intersect(after)
    assert(leaked.isEmpty,
      s"invalidateAll left ${leaked.size} checkpointed RDD(s) persistent: $leaked")
  }
}
