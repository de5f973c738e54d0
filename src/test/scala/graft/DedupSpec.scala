package graft

import graft.operators.{DedupPack, TextPack}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("minhash-LSH recalls every exact-Jaccard near-dup pair (>= 0.8)") {
    val exact = TextPack.queries("q_dedup_ngram_jaccard")(spark, TestSpark.Sf)
      .filter(col("jaccard") >= 0.8)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupPack.queries("q_dedup_minhash_lsh")(spark, TestSpark.Sf)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test data should contain planted near-dups")
    val missed = exact -- lsh
    assert(missed.isEmpty, s"LSH missed high-similarity pairs: $missed")
  }

  test("containment catches an embedded doc that symmetric jaccard misses") {
    import spark.implicits._
    // doc 0 is a contiguous prefix of doc 1: all of 0's shingles appear
    // in 1 -> containment 1.0, while jaccard = 8/28 < 0.5 (invisible to
    // the symmetric gate)
    val short = (1 to 10).map(i => s"w$i").mkString(" ")
    val long = short + " " + (11 to 30).map(i => s"w$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("contain").toString
    Seq((0L, short, "en", "s1", short.length.toLong),
      (1L, long, "en", "s1", long.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextPack.queries("q_dedup_containment")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getAs[Long]("doc1"), r.getAs[Long]("doc2")) == ((0L, 1L)))
    assert(r.getAs[Long]("inter") == 8L)
    assert(r.getAs[Double]("containment") == 1.0)
    assert(r.getAs[Double]("jaccard") < 0.5)
    // and the symmetric gate indeed does NOT pair them
    val sym = TextPack.queries("q_dedup_ngram_jaccard")(spark, dir).collect()
    assert(!sym.exists(x => x.getAs[Long]("doc1") == 0L && x.getAs[Long]("doc2") == 1L))
  }

  test("minhash calibration: exact-dup pair pins the n_match=32 bucket; invariants hold") {
    import spark.implicits._
    // two identical docs (J = 1, all 32 minima equal, every band collides
    // deterministically) + one unrelated doc that collides in no band
    val a = (1 to 20).map(i => s"w$i").mkString(" ")
    val other = (100 to 130).map(i => s"v$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("calib").toString
    Seq((0L, a, "en", "s1", a.length.toLong),
      (1L, a, "en", "s1", a.length.toLong),
      (2L, other, "en", "s1", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = DedupPack.queries("q_minhash_calibration")(spark, dir).collect()
    assert(rows.length == 1, s"expected only the identical pair's bucket, got ${rows.toSeq}")
    val r = rows.head
    assert(r.getAs[Long]("n_match") == 32L)
    assert(r.getAs[Long]("n_pairs") == 1L)
    assert(r.getAs[Long]("sum_inter") == r.getAs[Long]("sum_union"))
    assert(r.getAs[Double]("est_jaccard") == 1.0)
    assert(r.getAs[Double]("pooled_jaccard") == 1.0)
    // real corpus: every bucket is a band collision (>= 4 matched perms),
    // unions dominate intersections, and the audit accounts for exactly
    // the LSH candidate set (sum of n_pairs == candidate pair count)
    val corpus = DedupPack.queries("q_minhash_calibration")(spark, TestSpark.Sf).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { c =>
      val nm = c.getAs[Long]("n_match")
      assert(nm >= 4L && nm <= 32L, s"band collision implies 4 <= n_match <= 32, got $nm")
      assert(c.getAs[Long]("sum_inter") <= c.getAs[Long]("sum_union"))
      assert(c.getAs[Double]("est_jaccard") == nm / 32.0)
    }
    val nCand = DedupPack.lshCandidates(DedupPack.bandSignatures(
      DedupPack.minhashFromShingles(TextPack.shinglesCached(spark, TestSpark.Sf)))).count()
    assert(corpus.map(_.getAs[Long]("n_pairs")).sum == nCand)
  }

  test("simhash pairs respect the hamming bound and are near-dups structurally") {
    val pairs = DedupPack.queries("q_dedup_simhash")(spark, TestSpark.Sf).collect()
    pairs.foreach(r => assert(r.getAs[Long]("hamming") <= 6))
  }

  test("ngram novelty: every shingle is novel exactly once, lowest doc first") {
    val rows = TextPack.queries("q_ngram_novelty")(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    // total novel shingles across docs == total distinct shingles in the corpus
    val distinctShingles = TextPack.shinglesCached(spark, TestSpark.Sf)
      .select("shingle").distinct().count()
    assert(rows.map(_.getAs[Long]("n_novel")).sum === distinctShingles,
      "each distinct shingle is credited as novel to exactly one doc")
    // the lowest doc_id carrying shingles is fully novel by construction
    val first = rows.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Long]("n_novel") === first.getAs[Long]("n_shingles"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_shingles"))
      val p = r.getAs[Double]("novelty")
      assert(p >= 0.0 && p <= 1.0)
    }
  }

  test("incremental dedup flags newest docs with their best standing match") {
    val pairs = TextPack.queries("q_dedup_ngram_jaccard")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    val thr = Tables.documents(spark, TestSpark.Sf)
      .agg(expr("(8 * max(doc_id)) div 10")).head.getLong(0)
    // sequential reference off the symmetric pair list
    val expected = (pairs.map(p => (p._1, p._2, p._3)) ++ pairs.map(p => (p._2, p._1, p._3)))
      .filter { case (n, old, _) => n > thr && old <= thr }
      .groupBy(_._1).view
      .mapValues(_.minBy(m => (-m._3, m._2))).toMap
    val got = TextPack.queries("q_dedup_incremental")(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(0), r.getLong(1), r.getDouble(5)))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (k, v) => assert(v === expected(k)) }
    assert(got.nonEmpty, "test corpus should have cross-threshold near-dups")
  }

  test("cluster label propagation keeps plan depth flat across iterations") {
    // the loop caches/localCheckpoints each round and unpersists the
    // superseded frame — the final plan must hang off a materialized
    // leaf, not the full two-joins-per-round lineage
    val df = TextPack.queries("q_dedup_clusters")(spark, TestSpark.Sf)
    val n = df.queryExecution.optimizedPlan.collect { case p => p }.size
    assert(n < 30, s"cluster plan should be truncated at a cached leaf, got $n nodes")
    assert(df.count() > 0)
  }

  /** Independent reference kernel for SimHash56: `split(" ", -1)` is the
    * Scala spelling of DuckDB's string_split semantics (ALL segments,
    * trailing empties kept, "" -> [""]), md5 via a fresh MessageDigest —
    * none of the expression's byte-walk or thread-local state.
    */
  private def kernelOf(t: String): Long = {
    val counts = new Array[Int](56)
    t.split(" ", -1).foreach { tok =>
      val d = java.security.MessageDigest.getInstance("MD5").digest(tok.getBytes("UTF-8"))
      val h = (0 until 7).foldLeft(0L)((a, i) => (a << 8) | (d(i) & 0xffL))
      (0 until 56).foreach(i =>
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1)
    }
    (0 until 56).foldLeft(0L)((s, i) => if (counts(i) > 0) s | (1L << i) else s)
  }

  test("native SimHash expression is bit-identical to the Scala kernel") {
    import spark.implicits._
    // adversarial split semantics: empty string, all-spaces, leading/
    // trailing/consecutive spaces, multibyte UTF-8 — plus the real corpus
    val edge = Seq("", " ", "  ", "a", " a", "a ", "a  ", "a b", "a  b",
      "a  b  ", "héllo wörld", "日本 語 テスト", "x " * 50)
      .zipWithIndex.map { case (t, i) => (1000L + i, t) }
      .toDF("doc_id", "text")
    val corpus = Tables.documents(spark, TestSpark.Sf).select("doc_id", "text")
    for (docs <- Seq(edge, corpus)) {
      val viaExpr = DedupPack.simhash(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val viaKernel = docs.collect()
        .map(r => (r.getAs[Long]("doc_id"), kernelOf(r.getAs[String]("text")))).toMap
      assert(viaExpr == viaKernel, "codegen'd SimHash diverged from the reference kernel")
    }
    // interpreted path (no codegen): direct expression eval must match the
    // kernel too — codegen fallback cannot flip signatures
    for (t <- Seq("", " ", "a  b  ", "héllo wörld", "the quick brown fox")) {
      val e = graft.functions.SimHash56Expr(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(t),
          org.apache.spark.sql.types.StringType))
      assert(e.eval(null) == kernelOf(t), s"interpreted SimHash diverged on '$t'")
    }
  }

  test("bucket cap keeps a degenerate identical-signature group from going quadratic") {
    import spark.implicits._
    // 2500 byte-identical docs (one shared simhash -> one bucket of 2500
    // in every band, past the 2000 cap) + one planted near-dup pair of
    // DISTINCT docs. Uncapped, the group alone emits 2500*2499/2 ≈ 3.1M
    // pairs; capped, it emits none (exact-dup mass is
    // q_dedup_exact_docs' job) and the planted pair must survive.
    val boiler = (0L until 2500L).map(i => (i, "lorem ipsum dolor sit amet " * 4))
    // the planted pair's text is distinct from the boilerplate, so its
    // bucket has size 2 — the cap must leave it untouched (signature
    // equality makes the pair's survival deterministic; hamming between
    // 1-token-different SHORT docs is not, so that variant can't be a
    // stable pin)
    val planted = Seq(
      (9000L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (9001L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val docs = (boiler ++ planted).toDF("doc_id", "text")
    val pairs = DedupPack.simhashPairs(DedupPack.simhash(docs))
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((9000L, 9001L)), "planted small-bucket pair lost")
    assert(pairs.length < 100, s"degenerate group leaked ${pairs.length} pairs")
    // same guard on the minhash band join: identical signature frames
    val sigs = (0L until 2500L).flatMap(i => (0 until 8).map(b => (i, b, "42,42,42,42")))
      .toDF("doc_id", "band", "sig")
    assert(DedupPack.lshCandidates(sigs).count() == 0)
  }

  test("per-doc pair cap bounds a hot under-cap cluster, keeps it connected") {
    import spark.implicits._
    // 300 identical docs: UNDER the 2000 bucket cap, so pre-r11 the band
    // join emitted C(300,2) = 44,850 pairs (the r10 10x rehearsal's
    // output-bound mode, 112x output growth on replica copies). The
    // per-doc cap bounds output to ~m·cap while each doc still pairs
    // with its next-64 successors — a connected chain, so CC
    // canonicalization still finds ONE cluster.
    val m = 300
    val hot = (0L until m.toLong).map(i => (i, "hot replica boilerplate text " * 8))
    val planted = Seq(
      (9000L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (9001L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val pairs = DedupPack.simhashPairs(DedupPack.simhash((hot ++ planted).toDF("doc_id", "text")))
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((9000L, 9001L)), "planted small-bucket pair lost")
    // both ids < m: a hash collision could land a planted doc (9000+) in
    // a hot band bucket, and a doc2 >= m would overflow the m-element
    // union-find below — the test must fail informatively, not crash
    val hotPairs = pairs.filter(p => p._1 < m && p._2 < m)
    assert(hotPairs.length <= m * DedupPack.PairsPerDocPerBucket,
      s"cap leaked ${hotPairs.length} pairs")
    assert(hotPairs.length < 44850, "cap did not engage on the hot cluster")
    // union-find: the hot cluster must remain ONE component
    val root = Array.tabulate(m)(identity)
    def find(x: Int): Int = { var r = x; while (root(r) != r) r = root(r); r }
    hotPairs.foreach { case (a, b) => root(find(a.toInt)) = find(b.toInt) }
    assert((0 until m).map(find).distinct.size === 1, "hot cluster disconnected by the cap")
  }

  test("property: expression matches the kernel on random strings with random spacing") {
    // deterministic fuzz of the string_split contract: random token
    // streams with random-length space runs, random leading/trailing
    // spaces, occasional multibyte tokens and empty strings — the
    // interpreted expression must equal the independent kernel on all
    var seed = 987654321L
    def next(n: Int): Int = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      (((seed >>> 33) % n + n) % n).toInt
    }
    val alphabet = Array("tok", "a", "xyzzy", "日本語", "héllo", "9", "")
    for (_ <- 1 to 300) {
      val parts = (0 until next(12)).map(_ => alphabet(next(alphabet.length)))
      val t = parts.mkString(" " * (1 + next(3))) + (" " * next(3))
      val e = graft.functions.SimHash56Expr(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(t),
          org.apache.spark.sql.types.StringType))
      assert(e.eval(null) == kernelOf(t), s"diverged on ${t.length}-char input '$t'")
    }
  }

  test("simhash signatures stay within 56 bits") {
    val sigs = DedupPack.simhash(
      Tables.documents(spark, TestSpark.Sf)).collect().map(_.getLong(1))
    assert(sigs.forall(s => s >= 0L && s < (1L << 56)))
  }
}
