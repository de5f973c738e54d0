package graft

import graft.sources.MockDataGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed deterministic generator (VERDICT r15 task 7): the
  * properties the rehearsals lean on — determinism across partitionings,
  * sf-prefix stability (content-addressing), schema parity with the
  * driver testdata, planted dup ground truth, and walk realism for the
  * reference-shape tick feed.
  */
class MockDataGenSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("deterministic across partitionings and repeated calls") {
    val a = MockDataGen.documents(spark, 500).repartition(7)
      .orderBy("doc_id").collect()
    val b = MockDataGen.documents(spark, 500).repartition(3)
      .orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("sf-prefix stability: a bigger SF is a strict superset") {
    val small = MockDataGen.documents(spark, 200)
    val bigPrefix = MockDataGen.documents(spark, 2000)
      .filter(col("doc_id") < 200)
    assert(small.exceptAll(bigPrefix).count() == 0)
    assert(bigPrefix.exceptAll(small).count() == 0)
    val se = MockDataGen.embeddings(spark, 150)
    val be = MockDataGen.embeddings(spark, 1500).filter(col("vec_id") < 150)
    assert(se.exceptAll(be).count() == 0)
  }

  test("schemas match the driver testdata tables") {
    val d = "/root/testdata/sf0.001"
    assert(MockDataGen.events(spark, 10).schema.map(f => (f.name, f.dataType)) ==
      spark.read.parquet(s"$d/events.parquet").schema.map(f => (f.name, f.dataType)))
    assert(MockDataGen.documents(spark, 10).schema.map(f => (f.name, f.dataType)) ==
      spark.read.parquet(s"$d/documents.parquet").schema.map(f => (f.name, f.dataType)))
    assert(MockDataGen.embeddings(spark, 10).schema.map(f => (f.name, f.dataType)) ==
      spark.read.parquet(s"$d/embeddings.parquet").schema.map(f => (f.name, f.dataType)))
  }

  test("planted exact-dup rate is real and discoverable by hash dedup") {
    val n = 20000L
    val docs = MockDataGen.documents(spark, n)
    val nDupRows = docs.groupBy(md5(col("text"))).count()
      .filter(col("count") > 1)
      .agg(sum(col("count") - 1)).collect()(0).getLong(0)
    val rate = nDupRows.toDouble / n
    // ≥ the planted exact rate (near-dup suffix collisions may add a few)
    assert(rate > 0.02 && rate < 0.08, s"exact-dup rate $rate out of band")
  }

  test("planted embedding near-dups have cosine ~ 1 with their canonical") {
    val emb = MockDataGen.embeddings(spark, 5000)
    // brute-force a sample of adjacent windows: for ~2% of ids some
    // earlier row within 1000 must be a cosine >= 0.999 partner
    val withNorm = emb.select(col("vec_id"), col("embedding"),
      sqrt(aggregate(transform(col("embedding"), x => x * x),
        lit(0.0d), (acc, x) => acc + x)).as("nrm"))
    val a = withNorm.select(col("vec_id").as("ida"), col("embedding").as("va"), col("nrm").as("na"))
    val b = withNorm.select(col("vec_id").as("idb"), col("embedding").as("vb"), col("nrm").as("nb"))
    val pairs = a.join(b, col("idb") < col("ida") && col("idb") >= col("ida") - 1000)
      .select(col("ida"), col("idb"),
        (aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
          lit(0.0d), (acc, x) => acc + x) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= 0.999)
    val nd = pairs.select("ida").distinct().count()
    assert(nd >= 50 && nd <= 250, s"planted emb near-dups: $nd (expect ~2% of 5000)")
  }

  test("tick walk: adjacent steps are small, long-range drift is larger") {
    val t = MockDataGen.ticks(spark, 4096, Seq("AAPL" -> 150.0))
      .orderBy("timestamp").select("price").collect().map(_.getDouble(0))
    val steps = t.sliding(2).map { case Array(p, q) => math.abs(math.log(q / p)) }.toSeq
    val meanStep = steps.sum / steps.size
    assert(meanStep < 0.06, s"adjacent log-step too large: $meanStep")
    // long-range: std of 512-apart log-ratios must exceed adjacent std
    val far = (0 until t.length - 512 by 97)
      .map(i => math.log(t(i + 512) / t(i)))
    val farStd = math.sqrt(far.map(x => x * x).sum / far.size)
    assert(farStd > 2 * meanStep,
      s"512-step drift $farStd not larger than per-step $meanStep")
    // prices stay positive and bounded (no degenerate blow-up)
    assert(t.forall(p => p > 1.0 && p < 150000.0))
  }

  test("generated suite drives the engine's own dedup operator end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gen").toString
    MockDataGen.writeSuite(spark, dir, sf = 0.004)
    try {
      val exact = SparkEntry.queries("q_dedup_exact_docs")(spark, dir)
      // 200 docs at 3% exact-dup rate → at least one dup group found
      assert(exact.count() > 0)
      val stats = SparkEntry.queries("q_text_stats")(spark, dir)
      assert(stats.count() == 200)
    } finally {
      Memo.invalidateAll()
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir))
    }
  }
}
