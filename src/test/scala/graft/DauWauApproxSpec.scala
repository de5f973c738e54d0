package graft

import graft.operators.EventsPack
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the production `dauWauApprox` against the exact q_dau_wau form
  * on a known synthetic population: DAU must be EXACTLY equal (it is a
  * plain count either way), and the HLL-union WAU must sit within 3% of
  * the exact trailing-7-day distinct count (lgConfigK=14 → relative
  * standard error ≈ 0.8%, so 3% is nearly 4σ). The exact form stays the
  * oracled query; this spec is the contract for swapping the sketch
  * form in at web-scale user counts, where the exact form's 7×
  * expansion + per-window distinct state is the engine's one unbounded
  * distinct aggregate.
  */
class DauWauApproxSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("first-touch q_dau_wau emission equals brute-force trailing distinct on random gap patterns") {
    // the exact query now counts each (user, window) via the user's
    // FIRST in-window activity day (lag-derived bounds, no distinct
    // aggregate); fuzz that proof on random sparse day sets — gaps of
    // every size straddling the 7-day horizon are the adversarial cases
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    val dayNs = 86400000000000L
    val rows = for {
      u <- 1 to 300
      d <- 0 until 40
      if rnd.nextDouble() < 0.12 // sparse: expected gap ~8 days straddles the horizon
    } yield (u.toLong, "e", d * dayNs, 0.0, s"u$u-d$d")
    val events = rows.toDF("user_id", "event_type", "ts", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("dauwau").toString
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventsPack.queries("q_dau_wau")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // brute force: every (user, day) against every active day's window
    val userDays = rows.map(r => (r._1, r._3 / dayNs)).distinct
    val activeDays = userDays.map(_._2).distinct.sorted
    val want = activeDays.map { d =>
      val dau = userDays.count(_._2 == d).toLong
      val wau = userDays.filter { case (_, day) => day >= d - 6 && day <= d }
        .map(_._1).distinct.size.toLong
      (d * 86400000L, dau, wau)
    }
    assert(got === want)
  }

  test("HLL WAU within 3% of exact; DAU exactly equal") {
    import spark.implicits._
    // 20 days; user u is active on day d iff (u*31 + d*17) % 5 < 2 —
    // deterministic, overlapping day populations of ~4k users each
    val dayNs = 86400000000000L
    val rows = for {
      u <- 1 to 10000
      d <- 0 until 20
      if (u * 31 + d * 17) % 5 < 2
    } yield (u.toLong, d * dayNs + (u % 97) * 1000L)
    val events = rows.toDF("user_id", "ts")

    val approx = EventsPack.dauWauApprox(events)
      .select("day_ms", "dau", "wau").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val userDays = events
      .select(col("user_id"), expr("ts div 86400000000000").as("day")).distinct()
    val dau = userDays.groupBy("day").agg(count(lit(1)).as("dau"))
    val days = dau.select(col("day").as("d"))
    val exact = userDays.join(broadcast(days),
        col("day") >= col("d") - 6 && col("day") <= col("d"))
      .groupBy("d").agg(countDistinct(col("user_id")).as("wau"))
      .join(dau, col("day") === col("d"))
      .select((col("d") * 86400000L).as("day_ms"), col("dau"), col("wau"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    assert(approx.keySet == exact.keySet)
    exact.foreach { case (day, (dauEx, wauEx)) =>
      val (dauAp, wauAp) = approx(day)
      assert(dauAp == dauEx, s"day $day: DAU $dauAp != $dauEx")
      val relErr = math.abs(wauAp - wauEx).toDouble / wauEx
      assert(relErr <= 0.03, s"day $day: WAU $wauAp vs exact $wauEx (err $relErr)")
    }
  }
}
