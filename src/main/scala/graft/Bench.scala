package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // GraftSession owns the session config AND the parallelism default
    // (SPARK_GRAFT_CPUS, else the machine's cores — the pinned local[32]
    // methodology on the driver box). One source of truth: r02's 217.5 s
    // cold pass was Bench defaulting to a different literal than the
    // documented methodology.
    val cpus = GraftSession.cpus
    val spark = GraftSession.get("graft-bench")
    // Warm outside the timings: session + codegen paths via the entry
    // query, then every benched table (footer decode + OS page cache) —
    // otherwise whichever query reads a table first absorbs its cold
    // start (BENCH_r01 recorded a 61.7s q_doc_fingerprint that re-runs
    // at 1.6s for exactly this reason).
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    new java.io.File(sfDir).listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach { f =>
        try spark.read.parquet(f.getPath).queryExecution.toRdd.count()
        catch { case _: Throwable => () }
      }
    // Fixed (sorted) query order: Scala Map iteration order is arbitrary,
    // which made per-round timings incomparable.
    // A query that throws must be VISIBLE, not a plausible-looking
    // time-to-exception row: rounds 1-5 benched the whole Backtester
    // family at sf0.1 as silent ANSI div-by-zero failures.
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    def pass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        // toRdd materializes every output row — count() would let Catalyst
        // prune projection-only work and understate the timings
        try { fn(spark, sfDir).queryExecution.toRdd.count() }
        catch { case e: Throwable =>
          failed += name
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    // Two passes: the BASELINE.md DuckDB methodology times a warm second
    // pass, so the comparable headline is the warm pass — cold carries
    // ~0.3-0.5s/query of one-time plan+codegen compile that the in-process
    // baseline never pays. Both are reported. Between passes, force a GC
    // and let Spark's ContextCleaner drain OFF-measurement: cleanup of a
    // pass's accumulated shuffle/broadcast state only triggers on driver
    // GC, and without this it lands on whichever queries run first in
    // the next pass (measured: the leading TPC-H block ran 2-4x its
    // isolated time in the warm pass, slower than its own cold rows).
    def drainCleanup(): Unit = { System.gc(); Thread.sleep(3000) }
    // The bench box carries EXTERNAL load (measured r07: loadavg 1.2-5
    // with zero local JVMs; one run put 12.7 s on a query that
    // re-isolated at 3.0 s with no code change, while the engine's own
    // max GC pause across a full logged bench was 59 ms). Sample
    // loadavg around the run, and time a THIRD pass so each query also
    // gets a best-of-two warm row: `value`/`queries` keep the pinned
    // single-second-pass methodology; `warm_min_total`/`queries_warm_min`
    // are the contention-filtered view of the same commit.
    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split(" ").take(3).mkString(",")
      catch { case _: Throwable => "" }
    def load1(): Double =
      try loadavg().split(",")(0).toDouble catch { case _: Throwable => 0.0 }
    // The box carries external load (r07: the driver's graded run started
    // at loadavg 4.99 and its cold total came out 2.6x the quiet-window
    // number for the same commit). Rather than produce another ambiguous
    // artifact, wait (bounded) for a quiet window, then record whether we
    // got one: `contended` in the JSON makes the adjudication mechanical.
    val quietThresh =
      sys.env.get("SPARK_GRAFT_QUIET_LOAD").flatMap(_.toDoubleOption).getOrElse(1.5)
    val quietWaitSec =
      sys.env.get("SPARK_GRAFT_QUIET_WAIT_SEC").flatMap(_.toIntOption).getOrElse(300)
    val waitDeadline = System.nanoTime() + quietWaitSec * 1000000000L
    while (load1() > quietThresh && System.nanoTime() < waitDeadline) {
      System.err.println(s"[bench] loadavg ${load1()} > $quietThresh; waiting for quiet window")
      Thread.sleep(15000)
    }
    val loadPre = loadavg()
    val contended = load1() > quietThresh
    val cold = pass()
    drainCleanup()
    val warm = pass()
    drainCleanup()
    val warm2 = pass()
    val loadPost = loadavg()
    val warmMin = warm.zip(warm2).map { case ((k, v1), (_, v2)) => k -> math.min(v1, v2) }
    def j(xs: Seq[(String, Double)]) =
      xs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = warm.map(_._2).sum
    val coldTotal = cold.map(_._2).sum
    val warmMinTotal = warmMin.map(_._2).sum
    // queries_cold makes cold-pass anomalies diagnosable per query
    // (r02's 217.5s cold total had no per-query breakdown to pin it).
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${j(warm)},"cold_total":$coldTotal,"queries_cold":${j(cold)},"warm_min_total":$warmMinTotal,"queries_warm_min":${j(warmMin)},"loadavg_pre":"$loadPre","loadavg_post":"$loadPost","contended":$contended,"failed":$failedJson,"cpus":"$cpus","sf":"$sfDir"}"""
    // The driver keeps only the LAST ~2000 chars of stdout: the full line
    // above is ~5 KB, so in rounds 1-3 the headline ("metric","value", the
    // whole warm map) was truncated away and only the cold map survived.
    // Print the full record FIRST (so a file-IO failure can never suppress
    // it), persist it to a file, then print a compact headline LAST, sized
    // to fit the tail window (slowest warm queries verbatim, the fast
    // remainder aggregated).
    println(full)
    // cwd-relative unless SPARK_GRAFT_OUT_DIR says otherwise; absolute
    // path is echoed in the headline so a stray cwd is visible.
    // bench_detail.json is the DRIVER's file (it overwrites it every graded
    // run — that clobbered the r07 quiet-window artifact BASELINE.md cited).
    // Builder runs set SPARK_GRAFT_DETAIL_FILE=bench_builder_rN.json so the
    // two never share a path.
    val detailName = sys.env.getOrElse("SPARK_GRAFT_DETAIL_FILE", "bench_detail.json")
    val detailPath = new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_OUT_DIR", "."), detailName).getCanonicalPath
    try {
      val pw = new java.io.PrintWriter(detailPath)
      try pw.println(full) finally pw.close()
    } catch { case e: Throwable => System.err.println(s"bench_detail write failed: $e") }
    def f2(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val byTime = warm.sortBy(-_._2)
    // chars for the queries map; total line must stay well inside the
    // driver's ~2000-char stdout tail (warm_min_total/loadavg fields
    // added ~60 chars in r07, so the budget came down to compensate)
    val budget = 1350
    var used = 0
    val kept = byTime.takeWhile { case (k, v) =>
      val e = k.length + f2(v).length + 4; if (used + e > budget) false else { used += e; true }
    }
    val rest = byTime.drop(kept.size)
    val restSum = rest.map(_._2).sum
    val keptJson = kept.map { case (k, v) => "\"" + k + "\":" + f2(v) }.mkString("{", ",", "}")
    // detailPath comes from the environment — escape it so a quote or
    // backslash in the directory can't break the strict last-line parser
    val detailJson = detailPath.replace("\\", "\\\\").replace("\"", "\\\"")
    println(s"""{"metric":"total","value":${f2(total)},"unit":"sec","queries":$keptJson,"fast_sum":${f2(restSum)},"fast_n":${rest.size},"cold_total":${f2(coldTotal)},"warm_min_total":${f2(warmMinTotal)},"loadavg":"$loadPre|$loadPost","failed_n":${failed.size},"cpus":"$cpus","sf":"$sfDir","detail":"$detailJson"}""")
    spark.stop()
  }
}
