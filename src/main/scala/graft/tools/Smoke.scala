package graft.tools

import graft.{GraftSession, SparkEntry}

/** Fast live-data smoke: the flagship entry plus the three query families
  * most sensitive to a feed-schema change (ts integer arithmetic, gap
  * math, window bucketing), run against the testdata AS IT EXISTS NOW.
  *
  * Exists because of round 8: the driver regenerated the testdata parquet
  * (events.ts timestamp[ns] → timestamp[us]) after the end-of-round
  * snapshot, and the breakage surfaced only in the next round's graded
  * artifacts. Run this before any snapshot/handoff commit — it fails fast
  * (nonzero exit, named query) while there is still time to adapt.
  *
  * `runMain graft.tools.Smoke [sfDir]` — defaults to sf0.001, ~30 s.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get("graft-smoke")
    val probes = Seq("q_normalize_trades", "q_ohlcv_1min", "q_sessionize")
    var failed = List.empty[String]
    def check(name: String)(rows: => Long): Unit =
      try {
        val n = rows
        if (n > 0) println(s"[smoke] OK   $name (rows=$n)")
        else { println(s"[smoke] FAIL $name: 0 rows"); failed ::= name }
      } catch { case e: Throwable =>
        println(s"[smoke] FAIL $name: ${e.getMessage.linesIterator.take(3).mkString(" | ")}")
        failed ::= name
      }
    check("entry")(SparkEntry.entry(spark).queryExecution.toRdd.count())
    probes.foreach(nm =>
      check(nm)(SparkEntry.queries(nm)(spark, d).queryExecution.toRdd.count()))
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[smoke] FAILED: ${failed.reverse.mkString(", ")} — " +
        "live testdata no longer matches the engine's feed contract (see SchemaSpec)")
      sys.exit(1)
    }
    println("[smoke] all green")
  }
}
