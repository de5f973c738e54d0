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
    * (unpersist cached DataFrames there).
    */
  def map[K, V](onEvict: V => Unit): TrieMap[K, V] = {
    val m = TrieMap.empty[K, V]
    synchronized { clearers += (() => { m.values.foreach(onEvict); m.clear() }) }
    m
  }

  def invalidateAll(): Unit = synchronized { clearers.foreach(_.apply()) }
}
