package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Live user sessionization as a Structured Streaming query — the
  * streaming counterpart of the batch q_sessionize operator
  * (reference: the event-analytics views the platform's dashboard tails;
  * batch form at graft.operators.EventsPack).
  *
  * Native `session_window` state: the store holds ONE merged open window
  * per (user, session) — bounded by concurrently-active users — rather
  * than buffering events, and the watermark both closes sessions (a
  * session emits once no event can extend it) and bounds state
  * retention. That is the 100 TB/streaming shape: state scales with
  * active entities, not event volume.
  *
  * Gap-boundary semantics: `session_window` keeps two events in one
  * session iff their gap is STRICTLY below `gap`; the batch operator's
  * `gap > G starts new session` keeps an exactly-G gap together. The
  * divergence is measure-zero on real feeds (ns-resolution timestamps);
  * the spec pins the strict-gap contract explicitly.
  */
object StreamingSessions {

  /** @param events    streaming DataFrame with ts:timestamp, user_id
    * @param gap       inactivity that closes a session (e.g. "30 minutes")
    * @param watermark allowed event-time lateness; also the session-close
    *                  emission delay in append mode
    */
  def sessions(events: DataFrame, gap: String = "30 minutes",
               watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(
        count(lit(1)).as("n_events"),
        unix_millis(min(col("ts"))).as("first_ms"),
        unix_millis(max(col("ts"))).as("last_ms"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("session_start_ms"),
        col("first_ms"), col("last_ms"), col("n_events"),
        (col("last_ms") - col("first_ms")).as("duration_ms"))
}
