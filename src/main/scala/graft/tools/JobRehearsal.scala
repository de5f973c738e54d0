package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import graft.GraftSession
import graft.sources.{CorpusJob, MarketJob}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Composed-job scale rehearsal (VERDICT r13 task 4): run the two
  * production jobs — CorpusJob (read → clean → pack → mix → shard
  * manifest) and MarketJob (validate → clean → resample → backtest →
  * report) — at 10x and 30x replicas of sf0.1 (tools/gen_scale.py,
  * decorrelated copies), recording per-stage wall seconds, task-duration
  * p50/p95/max, and shuffle bytes (total + peak per task), plus the
  * physical ShardWriter write at 10x.
  *
  * Stage boundaries are CUMULATIVE (each stage action re-rides the memo
  * graph the previous stage warmed — exactly how the composed job runs),
  * so the per-stage numbers isolate the marginal cost of each new layer.
  *
  * Pass criteria (BASELINE.md carries the measured rows): wall time
  * sublinear 10x→30x (ratio <= ~3) per job, and max/p95 task duration
  * <= ~1.5 on every stage (no straggler owns a hot key).
  *
  * `runMain graft.tools.JobRehearsal [dir10] [dir30]` — one JSON line;
  * SPARK_GRAFT_JOB_FILE overrides the output path.
  */
object JobRehearsal {

  private final class TaskStats extends SparkListener {
    val durs = new ConcurrentLinkedQueue[Long]()
    val shufRead = new ConcurrentLinkedQueue[Long]()
    val shufWrite = new ConcurrentLinkedQueue[Long]()
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
      if (te.taskInfo != null) {
        durs.add(te.taskInfo.duration)
        if (te.taskMetrics != null) {
          shufRead.add(te.taskMetrics.shuffleReadMetrics.totalBytesRead)
          shufWrite.add(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
      }
  }

  private def pct(sorted: Array[Long], p: Double): Long =
    if (sorted.isEmpty) 0L
    else sorted(math.min(sorted.length - 1, (p * sorted.length).toInt))

  def main(args: Array[String]): Unit = {
    val dir10 = args.headOption.getOrElse("/tmp/sfscale10")
    val dir30 = args.lift(1).getOrElse("/tmp/sfscale30")
    val spark = GraftSession.get("graft-jobrehearsal")
    // straggler-visible reduce width, as in SkewRehearsal
    spark.conf.set("spark.sql.shuffle.partitions", "256")

    val out = scala.collection.mutable.LinkedHashMap[String, String]()

    def stage(scale: String, name: String)(action: => Long): Unit = {
      val st = new TaskStats
      spark.sparkContext.addSparkListener(st)
      val t0 = System.nanoTime()
      val rows = action
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(st)
      val ds = st.durs.toArray(Array.empty[java.lang.Long]).map(_.longValue).sorted
      val p50 = pct(ds, 0.50); val p95 = pct(ds, 0.95)
      val mx = if (ds.isEmpty) 0L else ds.last
      val sr = st.shufRead.toArray(Array.empty[java.lang.Long]).map(_.longValue)
      val sw = st.shufWrite.toArray(Array.empty[java.lang.Long]).map(_.longValue)
      val key = s"${scale}_$name"
      out(key) = f"""{"rows":$rows,"sec":$sec%.2f,"n_tasks":${ds.length},""" +
        f""""p50_ms":$p50,"p95_ms":$p95,"max_ms":$mx,""" +
        f""""max_over_p95":${if (p95 > 0) mx.toDouble / p95 else 0.0}%.2f,""" +
        f""""shuffle_read_mb":${sr.sum / 1e6}%.1f,"shuffle_write_mb":${sw.sum / 1e6}%.1f,""" +
        f""""peak_task_shuffle_read_mb":${(if (sr.isEmpty) 0L else sr.max) / 1e6}%.1f}"""
      System.err.println(s"[jobrehearsal] $key -> ${out(key)}")
    }

    def corpusJob(scale: String, d: String): Unit = {
      stage(scale, "corpus_clean") { CorpusJob.cleanedDocs(spark, d).count() }
      stage(scale, "corpus_pack_mix") { CorpusJob.mixedLayout(spark, d).count() }
      stage(scale, "corpus_manifest") { CorpusJob.manifest(spark, d).collect().length.toLong }
    }

    def marketJob(scale: String, d: String): Unit =
      stage(scale, "market_summary") { MarketJob.summary(spark, d).collect().length.toLong }

    corpusJob("10x", dir10)
    marketJob("10x", dir10)
    // physical shard write at 10x: the full run() (write + manifest)
    stage("10x", "corpus_shard_write") {
      CorpusJob.run(spark, dir10, "/tmp/graft_r14_shards").count()
    }
    corpusJob("30x", dir30)
    marketJob("30x", dir30)

    val line = out.map { case (k, v) => s""""$k":$v""" }
      .mkString(s"""{"metric":"job_rehearsal","dir10":"$dir10","dir30":"$dir30","stages":{""", ",", "}}")
    println(line)
    val name = sys.env.getOrElse("SPARK_GRAFT_JOB_FILE", "job_rehearsal.json")
    val f = if (new java.io.File(name).isAbsolute) new java.io.File(name)
      else new java.io.File(sys.env.getOrElse("SPARK_GRAFT_OUT_DIR", "."), name)
    try {
      val pw = new java.io.PrintWriter(f)
      try pw.println(line) finally pw.close()
    } catch { case e: Throwable => System.err.println(s"job rehearsal write failed: $e") }
    spark.stop()
  }
}
