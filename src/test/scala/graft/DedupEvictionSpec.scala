package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-7 deterministic-eviction contract for the iterative /
  * staged dedup operators: building q_dedup_clusters (label-propagation
  * loop with per-round localCheckpoint) and q_dedup_embedding
  * (hyperplane LSH with four interior cache barriers) must leave ONLY
  * the session-memoized frames resident — every piece of scaffolding
  * (checkpoint blocks, seed/edge caches, signature/bucket caches)
  * unpersists inside the build. Before r07 each CALL leaked its
  * scaffolding to the async ContextCleaner, which made bench timings of
  * whatever ran next nondeterministic (q_dedup_clusters measured
  * 2.19-8.11 s across identical driver runs).
  */
class DedupEvictionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def persistentCount: Int = spark.sparkContext.getPersistentRDDs.size

  test("cluster build leaves no per-call scaffolding; repeat calls add nothing") {
    val q = SparkEntry.queries("q_dedup_clusters")
    q(spark, TestSpark.Sf).collect()
    val afterOnce = persistentCount
    q(spark, TestSpark.Sf).collect()
    q(spark, TestSpark.Sf).collect()
    // memo hit: the loop (and its checkpoints/edge caches) must not rerun
    assert(persistentCount == afterOnce,
      s"repeat q_dedup_clusters calls grew persistent RDDs: $afterOnce -> $persistentCount")
  }

  test("embedding near-dup build leaves no per-call scaffolding") {
    val q = SparkEntry.queries("q_dedup_embedding")
    q(spark, TestSpark.Sf).collect()
    val afterOnce = persistentCount
    q(spark, TestSpark.Sf).collect()
    assert(persistentCount == afterOnce,
      s"repeat q_dedup_embedding calls grew persistent RDDs: $afterOnce -> $persistentCount")
  }

  test("simhash signature memo is per-session, not per-call (r10 promotion)") {
    val q = SparkEntry.queries("q_dedup_simhash")
    q(spark, TestSpark.Sf).collect()
    val afterOnce = persistentCount
    q(spark, TestSpark.Sf).collect()
    assert(persistentCount == afterOnce,
      s"repeat q_dedup_simhash calls grew persistent RDDs: $afterOnce -> $persistentCount")
  }

  test("memo invalidation unpersists the dedup results and the build re-runs") {
    val rows = SparkEntry.queries("q_dedup_clusters")(spark, TestSpark.Sf).collect()
    val before = persistentCount
    assert(before > 0)
    Memo.invalidateAll()
    // registered memos evict + unpersist (non-Memo cache barriers owned
    // by individual operators — e.g. k-means assignment frames — may
    // remain; they carry live lineage and are safe to evict lazily)
    assert(persistentCount < before,
      s"Memo.invalidateAll freed nothing ($before persistent RDDs)")
    // the build re-runs cleanly from a cold memo (checkpoint truncation
    // must not have poisoned the rebuilt lineage)
    val rebuilt = SparkEntry.queries("q_dedup_clusters")(spark, TestSpark.Sf).collect()
    assert(rebuilt.length == rows.length)
  }

  test("two-tier LSH cache: dedup-only builds the thresholded tier; a kNN consumer promotes and evicts it (r12)") {
    import graft.operators.AnnPack
    Memo.invalidateAll() // cold memos: this test owns the session state
    def sortedRows(name: String) =
      SparkEntry.queries(name)(spark, TestSpark.Sf).collect()
        .map(_.toString).sorted.toSeq
    // a dedup-only session must pin ONLY the 0.35-thresholded frame
    val dedupRows = sortedRows("q_dedup_embedding")
    val (full1, tier1) = AnnPack.nearDupTierState(spark, TestSpark.Sf)
    assert(!full1, "dedup-only session materialized the full unthresholded pool")
    assert(tier1, "dedup-only session did not memoize the thresholded tier")
    // the first kNN-graph consumer builds the full pool and evicts the
    // now-redundant tier (dedup becomes a filter of the pool)
    SparkEntry.queries("q_knn_graph")(spark, TestSpark.Sf).collect()
    val (full2, tier2) = AnnPack.nearDupTierState(spark, TestSpark.Sf)
    assert(full2, "kNN consumer did not materialize the full pool")
    assert(!tier2, "promotion left the redundant thresholded tier pinned")
    // hashes unchanged: the thresholded pass and the pool filter are
    // value-identical (threshold is a pure cosine >= t filter on the
    // same snapped cosine)
    assert(sortedRows("q_dedup_embedding") == dedupRows,
      "dedup results changed across the tier promotion")
  }
}
