package graft

import scala.collection.concurrent.TrieMap

/** Registry for the session-memoized shared subplans (bars, shingles,
  * jaccard pairs, portfolio stats/frontier). Entries are keyed by
  * (session, dataset[, param]) and are never implicitly invalidated —
  * correct for the driver's immutable test datasets, a stale-read hazard
  * for a long-lived session over mutable paths. Such sessions call
  * [[Memo.invalidateAll]] after rewriting inputs: every registered memo
  * map clears and its materialized DataFrames unpersist.
  */
object Memo {
  private val clearers = scala.collection.mutable.ArrayBuffer.empty[() => Unit]

  /** A registered memo map; `onEvict` runs per value on invalidation
    * (unpersist cached DataFrames there — use [[release]] for DataFrame
    * values so checkpoint-materialized frames actually free their blocks).
    */
  def map[K, V](onEvict: V => Unit): TrieMap[K, V] = {
    val m = TrieMap.empty[K, V]
    synchronized { clearers += (() => { m.values.foreach(onEvict); m.clear() }) }
    m
  }

  def invalidateAll(): Unit = synchronized { clearers.foreach(_.apply()) }

  /** The r16 materialization pattern for deep-lineage memo frames:
    * localCheckpoint truncates the logical plan to the computed rows —
    * without it every consumer QUERY re-analyzes the memo's full build
    * lineage on every call (the per-call driver gap ProfileQuery
    * attributes to no stage; the IVF-PQ explain was 27.5k lines of
    * re-inlined k-means before the cut) — and the cache layer on top
    * restores accurate size statistics, which a bare LogicalRDD lacks
    * (default sizeInBytes = huge), so the planner keeps auto-broadcasting
    * genuinely small memo frames instead of falling back to sort-merge
    * (measured +0.7 s on q_ann_recall_audit with the checkpoint alone).
    * Values are unchanged — the memo builders are deterministic.
    * [[release]] unpersists both layers.
    */
  def pin(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.localCheckpoint().cache()

  /** Eviction hook for DataFrame-valued memos. `Dataset.unpersist` only
    * consults the CacheManager, which does not track the RDD-level
    * persistence `localCheckpoint` installs — so for the checkpoint-
    * materialized memo frames (the repartition+localCheckpoint pattern)
    * it is a no-op and the blocks would stay resident until the
    * ContextCleaner eventually GCs the RDD. Walk the analyzed plan for
    * the checkpoint's `LogicalRDD` leaves and unpersist their RDDs
    * directly, in addition to the CacheManager path.
    */
  def release(df: org.apache.spark.sql.DataFrame): Unit = {
    import scala.util.control.NonFatal
    try df.unpersist() catch { case NonFatal(_) => () }
    try df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        try lr.rdd.unpersist(blocking = false) catch { case NonFatal(_) => () }
      case _ => ()
    } catch { case NonFatal(_) => () }
  }
}
