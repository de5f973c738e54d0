package graft

import graft.operators.EventsPack
import org.scalatest.funsuite.AnyFunSuite

/** Hand-value pins for the event-stream analytics additions (funnel
  * timing, per-user LTV) — the oracles prove engine parity; these
  * prove the definitions on a planted stream.
  */
class EventsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("events").toString
    rows.map { case (id, ts, uid, et, v) => (id, ts, uid, et, v, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("funnel timing: exact rank quantiles of planted stage gaps") {
    val sec = 1000000000L
    val dir = corpus(Seq(
      // user 1 completes the funnel: gaps 10s, 30s, 60s
      (0L, 0L, 1L, "signup", 1.0), (1L, 10 * sec, 1L, "view", 1.0),
      (2L, 40 * sec, 1L, "click", 1.0), (3L, 100 * sec, 1L, "purchase", 25.0),
      // user 2 stops after view: gap 20s
      (4L, 5 * sec, 2L, "signup", 1.0), (5L, 25 * sec, 2L, "view", 1.0),
      // user 3 never signs up -> outside the funnel
      (6L, 7 * sec, 3L, "view", 1.0)))
    val out = EventsPack.queries("q_funnel_timing")(spark, dir).collect()
      .map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("p50_gap_s"),
          r.getAs[Long]("p90_gap_s"), r.getAs[Long]("max_gap_s"))).toMap
    assert(out("1_signup_to_view") == ((2L, 10L, 20L, 20L)))
    assert(out("2_view_to_click") == ((1L, 30L, 30L, 30L)))
    assert(out("3_click_to_purchase") == ((1L, 60L, 60L, 60L)))
  }

  test("user ltv: exact cent sums, purchase counts, day spans") {
    val day = 86400000000000L
    val dir = corpus(Seq(
      (0L, 0L, 1L, "view", 9.99),
      (1L, 1000L, 1L, "purchase", 25.00),
      (2L, day + 1000L, 1L, "purchase", 10.555), // floor(1055.5+0.5) = 1056
      (3L, 5000L, 2L, "click", 3.0)))
    val out = EventsPack.queries("q_user_ltv")(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_purchases"),
          r.getAs[Long]("ltv_cents"), r.getAs[Long]("span_days"))).toMap
    assert(out(1L) == ((3L, 2L, 2500L + 1056L, 2L)))
    assert(out(2L) == ((1L, 0L, 0L, 1L)))
  }
}
