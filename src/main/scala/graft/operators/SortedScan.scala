package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.functions.col

/** Secondary-sort streaming scan: repartition by key, sort within each
  * partition by (key, time), then run a sequential per-key scan over each
  * run of consecutive same-key rows.
  *
  * This is the scalable replacement for `groupByKey(...).flatMapGroups`
  * with an in-memory `toSeq.sortBy`: the shuffle's sort does the ordering,
  * and input rows STREAM through the scan — a hot key holds only its open
  * state (resting book, current position) in the heap, never its whole
  * event history. At 100 TB a single symbol's order flow can exceed one
  * executor's memory; its live book cannot.
  */
object SortedScan {

  /** @param keyCols   repartition/grouping columns (run boundary)
    * @param orderCols secondary-sort columns (scan order inside a key)
    * @param key       extractor matching keyCols from a decoded row
    * @param scan      sequential per-key scan; MUST consume or ignore its
    *                  input iterator only forward (it is drained on exit)
    */
  def perKey[I, O: Encoder](ds: Dataset[I], keyCols: Seq[String], orderCols: Seq[String])
                           (key: I => String)
                           (scan: (String, Iterator[I]) => Iterator[O]): Dataset[O] = {
    val sorted = ds
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)
    sorted.mapPartitions { it =>
      val buf = it.buffered
      new Iterator[Iterator[O]] {
        def hasNext: Boolean = buf.hasNext
        def next(): Iterator[O] = {
          val k = key(buf.head)
          val run = new Iterator[I] {
            def hasNext: Boolean = buf.hasNext && key(buf.head) == k
            def next(): I = buf.next()
          }
          val out = scan(k, run)
          // drain any unconsumed tail so the next run starts on a boundary
          new Iterator[O] {
            def hasNext: Boolean = {
              val h = out.hasNext
              if (!h) while (run.hasNext) run.next()
              h
            }
            def next(): O = out.next()
          }
        }
      }.flatten
    }
  }
}
