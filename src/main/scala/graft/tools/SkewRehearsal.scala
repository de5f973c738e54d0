package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import graft.{GraftSession, Tables}
import graft.operators.{CorpusPack, SaltedJoin, TextPack}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hot-shingle skew rehearsal (VERDICT r12 task 7): plant ONE shingle
  * key carrying ~10% of the corpus-side join-input mass into a
  * `mult`-x replica of the sf documents table, then measure the
  * per-task duration distribution of every shingle-keyed shape the
  * suite ships:
  *
  *   - `decon_aqe`      — q_decontaminate's corp⋈eval 5-gram join as
  *                        shipped (AQE skew-split only);
  *   - `decon_salted`   — the same join with SaltedJoin hot-key
  *                        scatter (the static fallback, to quantify
  *                        what salting buys IF AQE were not enough);
  *   - `novelty_join`   — q_ngram_novelty's PRE-r13 shape (postings ⋈
  *                        first-occurrence on shingle) — kept here as
  *                        the negative control the rewrite retired;
  *   - `novelty_agg`    — the shipped r13 shape: two combine-safe
  *                        aggregates + a doc-keyed join (the hot key
  *                        collapses map-side; no shingle join at all).
  *
  * Pass criterion (BASELINE.md carries the measured row): within each
  * variant's timed job, max task duration <= ~4x the p95 task duration
  * — i.e. no single straggler task owns the hot key. Durations come
  * from a SparkListener over the timed job only; the planted shingle
  * tables are cached and materialized untimed so build stages (uniform
  * by construction) don't dilute the join-stage signal.
  *
  * `runMain graft.tools.SkewRehearsal [sfDir] [mult]` — prints one
  * JSON line; SPARK_GRAFT_SKEW_FILE overrides the output path.
  */
object SkewRehearsal {

  /** Collects every task duration (ms) seen while registered. */
  private final class TaskStats extends SparkListener {
    val durs = new ConcurrentLinkedQueue[Long]()
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
      if (te.taskInfo != null) durs.add(te.taskInfo.duration)
  }

  private def pct(sorted: Array[Long], p: Double): Long =
    if (sorted.isEmpty) 0L
    else sorted(math.min(sorted.length - 1, (p * sorted.length).toInt))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val mult = args.lift(1).flatMap(_.toIntOption).getOrElse(30)
    val hotFrac = 0.10
    val spark = GraftSession.get("graft-skewrehearsal")
    // More reduce partitions than cores so a hot key CAN manifest as a
    // straggler partition (at 32 partitions the hot key is only ~3x the
    // average bucket and the rehearsal would vacuously pass).
    spark.conf.set("spark.sql.shuffle.partitions", "256")
    import spark.implicits._

    // ---- planted corpus: mult-x replica + hot-shingle docs ----------
    val base = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "lang", "text")
    val maxId = base.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val rep = base
      .withColumn("r", explode(sequence(lit(0L), lit(mult - 1L))))
      .select((col("doc_id") + col("r") * maxId).as("doc_id"),
        col("source"), col("lang"), col("text"))

    // Corpus-side postings mass of the replica (distinct 5-grams).
    val repSh = CorpusPack.shingles5(rep).cache()
    val basePostings = repSh.filter(col("source") =!= CorpusPack.EvalSource).count()
    // Each hot doc "u<i> zzhot zzhot zzhot zzhot zzhot" owns exactly 2
    // distinct 5-grams, one of them THE hot key -> nHot docs put nHot
    // postings on one key out of (basePostings + 2*nHot) total:
    // nHot = f/(1-2f) * basePostings gives the hot key fraction f.
    val nHot = (hotFrac / (1 - 2 * hotFrac) * basePostings).toLong
    val hotDocs = spark.range(nHot).select(
      (col("id") + mult * maxId).as("doc_id"),
      lit("src0").as("source"), lit("en").as("lang"),
      concat(lit("u"), col("id"), lit(" zzhot zzhot zzhot zzhot zzhot")).as("text"))
    // ... and the SAME phrase inside 3 eval docs (the contamination the
    // join must surface): hot output = nHot x 3 rows, all one key.
    val evalHot = spark.range(3).select(
      (col("id") + mult * maxId + nHot).as("doc_id"),
      lit(CorpusPack.EvalSource).as("source"), lit("en").as("lang"),
      concat(lit("e"), col("id"), lit(" zzhot zzhot zzhot zzhot zzhot")).as("text"))

    val hotSh = CorpusPack.shingles5(hotDocs.unionByName(evalHot))
    val shd = repSh.unionByName(hotSh).cache()
    val ev = shd.filter(col("source") === CorpusPack.EvalSource)
      .select(col("doc_id").as("eval_doc"), col("shingle")).cache()
    val corp = shd.filter(col("source") =!= CorpusPack.EvalSource)
      .select("doc_id", "shingle").cache()
    val (corpN, evN) = (corp.count(), ev.count()) // materialize untimed
    System.err.println(s"[skew] corp=$corpN ev=$evN hot_df=$nHot " +
      f"(${nHot.toDouble / corpN * 100}%.1f%% of corp postings)")

    // 3-gram postings for the novelty shapes (same planted corpus).
    val sh3 = TextPack.shingles(rep.unionByName(hotDocs).unionByName(evalHot))
      .select("doc_id", "shingle").cache()
    val sh3N = sh3.count()

    val results = scala.collection.mutable.LinkedHashMap[String, String]()

    def measure(name: String, inRows: Long)(run: => Long): Unit = {
      val stats = new TaskStats
      spark.sparkContext.addSparkListener(stats)
      val t0 = System.nanoTime()
      val out = run
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // listener bus drain
      spark.sparkContext.removeSparkListener(stats)
      val ds = stats.durs.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
      val (p50, p95, mx) = (pct(ds, 0.50), pct(ds, 0.95), if (ds.isEmpty) 0L else ds.last)
      val ratio = if (p95 > 0) mx.toDouble / p95 else 0.0
      results(name) =
        f""""$name":{"rows_in":$inRows,"out_rows":$out,"sec":$sec%.2f,""" +
          f""""n_tasks":${ds.length},"p50_ms":$p50,"p95_ms":$p95,"max_ms":$mx,""" +
          f""""max_over_p95":$ratio%.2f}"""
      System.err.println(f"[skew] $name%-14s ${ds.length}%5d tasks p50=${p50}ms " +
        f"p95=${p95}ms max=${mx}ms max/p95=$ratio%.2f ($sec%.1fs, out=$out)")
    }

    // 1. q_decontaminate join shape, AQE skew-split only (as shipped).
    measure("decon_aqe", corpN + evN) {
      corp.join(ev, "shingle")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_hit_shingles"),
          countDistinct(col("eval_doc")).as("n_eval_docs"))
        .count()
    }

    // 2. The same join with the static hot-key salting fallback.
    measure("decon_salted", corpN + evN) {
      SaltedJoin(corp, ev, "shingle", salt = 32)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_hit_shingles"),
          countDistinct(col("eval_doc")).as("n_eval_docs"))
        .count()
    }

    // 3. Negative control: the pre-r13 novelty shape (shingle-key join).
    measure("novelty_join", sh3N) {
      val first = sh3.groupBy("shingle").agg(min(col("doc_id")).as("first_doc"))
      sh3.join(first, "shingle")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum((col("first_doc") === col("doc_id")).cast("long")).as("n_novel"))
        .count()
    }

    // 4. The shipped r13 shape: combine-safe aggregates, doc-keyed join.
    measure("novelty_agg", sh3N) {
      val perDoc = sh3.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
      val novel = sh3.groupBy("shingle").agg(min(col("doc_id")).as("first_doc"))
        .groupBy(col("first_doc").as("doc_id")).agg(count(lit(1)).as("n_novel"))
      perDoc.join(novel, Seq("doc_id"), "left").count()
    }

    val json =
      s"""{"metric":"skew_rehearsal","sf":"$sfDir","mult":$mult,""" +
        s""""hot_df":$nHot,"hot_frac":${f"${nHot.toDouble / corpN}%.3f"},""" +
        s""""shuffle_partitions":256,"variants":${results.values.mkString("{", ",", "}")}}"""
    println(json)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_SKEW_FILE", "skew_rehearsal.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
