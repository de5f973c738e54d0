package graft

import graft.operators.Ann
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF quality: recall vs brute-force ground truth.
  *
  * The recall >= 0.9 assertion runs on clusterable synthetic embeddings —
  * the regime IVF exists for. The driver's test corpus is isotropic
  * random vectors (measured within-label mean cosine ~= cross-label ~= 0),
  * where NO sublinear ANN can beat scanning, so there the spec asserts
  * exactness properties instead: every planted near-duplicate neighbor
  * (cosine >= 0.35) of a query must still be retrieved, and returned
  * cosines must match brute force bit-for-bit.
  */
class AnnSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("adaptive LSH sizing recalls planted near-dups at a corpus size where fixed bits=3 collapsed") {
    // r10 regression test: at 30x sf0.1 (60k vectors) the fixed 3-bit
    // signature put EVERY vector into one of 8 per-band buckets, all
    // past the 2000 cap -> zero pairs. autoLshParams must keep expected
    // bucket size ~64, so the cap never engages on non-degenerate data.
    assert(Ann.autoLshParams(200) == (3, 12))   // small corpora unchanged
    assert(Ann.autoLshParams(2000) == (5, 16))
    assert(Ann.autoLshParams(60000) == (10, 26))
    // 4096 deterministic vectors + 50 planted pairs (n=4146: bits=7, bands=20)
    val n = 4096
    val dim = 64
    def lcg(seed: Long): Long = (seed * 1103515245L + 12345L) % 2147483648L
    val base = (0 until n).map { i =>
      var s = i.toLong * 7919 + 17
      val v = Array.fill(dim) { s = lcg(s); s.toDouble / 2147483648.0 - 0.5 }
      (i.toLong, v.toSeq)
    }
    val planted = (0 until 50).map { p =>
      val src = base(p * 80)._2.toArray
      // near-identical copy: one component nudged by 1e-3 (cosine ~ 1)
      src(p % dim) += 1e-3
      ((100000 + p).toLong, src.toSeq)
    }
    val emb = Ann.withNorm((base ++ planted).toDF("vec_id", "e"))
    val (bits, bands) = Ann.autoLshParams(emb.count())
    assert(bits == 7 && bands == 20)
    val pairs = Ann.hyperplaneNearDup(emb, bands, bits, threshold = 0.9, cap = 2000)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = (0 until 50).map(p => (p * 80L, 100000L + p)).filterNot(pairs.contains)
    assert(missed.isEmpty, s"adaptive LSH missed planted near-dup pairs: $missed")
  }

  test("native dot product equals the zip_with fold bit-for-bit (codegen + interpreted)") {
    val df = Seq(
      (Seq(1.5, -2.25, 3.0), Seq(0.5, 4.0, -1.125)),
      (Seq(0.1, 0.2, 0.3), Seq(0.7, 0.8, 0.9))
    ).toDF("a", "b")
    val rows = df.select(
      graft.functions.DotProduct(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), _ * _), lit(0.0), _ + _).as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    // interpreted path (no codegen): direct expression eval
    val e = graft.functions.DotProductExpr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(2.0, 3.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(5.0, 7.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) == 31.0)
  }

  test("k-means IVF nprobe=2 reaches >=0.9 recall@5 vs brute force on clustered data") {
    val rnd = new scala.util.Random(42)
    val dim = 16; val clusters = 8; val n = 400
    val centers = Array.fill(clusters, dim)(rnd.nextGaussian())
    // vec_id i belongs to cluster i % 8, so the k seed ids cover all clusters
    val rows = (0 until n).map { i =>
      (i.toLong, centers(i % clusters).map(x => x + 0.15 * rnd.nextGaussian()).toSeq)
    }
    val emb = Ann.withNorm(rows.toDF("vec_id", "e")).cache()
    val ivf = Ann.ivfTopK(emb, nQueries = 10, k = 5, cells = clusters, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Ann.bruteTopK(emb, nQueries = 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val recall = brute.count(ivf.contains).toDouble / brute.length
    assert(recall >= 0.9, s"recall@5 = $recall")
  }

  test("q_ann_recall_audit: one row per sampled query, counts consistent with the two topk queries") {
    val rows = graft.operators.AnnPack.queries("q_ann_recall_audit")(spark, TestSpark.Sf).collect()
    assert(rows.length == 10, s"expected 10 sampled queries, got ${rows.length}")
    rows.foreach { r =>
      val (nTrue, nHit) = (r.getAs[Long]("n_true"), r.getAs[Long]("n_hit"))
      assert(nTrue == 5L)
      assert(nHit >= 0L && nHit <= nTrue)
      assert(r.getAs[Double]("recall_at_5") == nHit.toDouble / nTrue)
    }
    // the audit must equal recall recomputed from the registered queries
    val ivf = graft.operators.AnnPack.queries("q_ann_ivf_topk")(spark, TestSpark.Sf)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = graft.operators.AnnPack.queries("q_ann_cosine_topk")(spark, TestSpark.Sf)
      .filter(col("rank") <= 5).select("q_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = truth.groupBy(_._1).view.mapValues(_.count(ivf.contains).toLong).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hit") == expect(r.getAs[Long]("q_id")),
        s"audit n_hit diverged for q_id ${r.getAs[Long]("q_id")}")
    }
  }

  test("graph beam search reaches >=0.8 recall@10 vs brute force on clustered data") {
    val rnd = new scala.util.Random(11)
    val dim = 16; val clusters = 8; val n = 400
    val centers = Array.fill(clusters, dim)(rnd.nextGaussian())
    val rows = (0 until n).map { i =>
      (i.toLong, centers(i % clusters).map(x => x + 0.15 * rnd.nextGaussian()).toSeq)
    }
    val emb = Ann.withNorm(rows.toDF("vec_id", "e")).cache()
    // ideal candidate pool (ALL scored pairs): the graph construction is
    // then a true kNN graph — isolates search quality from LSH blocking
    // quality (the LSH-pool composition is exercised on the real corpus
    // by the q_ann_beam_topk row below)
    val a = emb.select(col("vec_id").as("v1"), col("e").as("e1"), col("nrm").as("n1"))
    val b = emb.select(col("vec_id").as("v2"), col("e").as("e2"), col("nrm").as("n2"))
    val cand = a.join(b, col("v1") < col("v2"))
      .withColumn("cosine",
        graft.functions.Port.r(Ann.dot(col("e1"), col("e2")) / (col("n1") * col("n2")), 6))
      .select("v1", "v2", "cosine")
    val beam = Ann.graphBeamTopK(emb, cand, nQueries = 10, k = 10).collect()
    // shape: ranks 1..k per query, no self-references
    beam.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq === (1L to rs.length).toSeq)
      rs.foreach(r => assert(r.getLong(1) !== q))
    }
    val got = beam.map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Ann.bruteTopK(emb, nQueries = 10, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val recall = brute.count(got.contains).toDouble / brute.length
    assert(recall >= 0.8, s"beam recall@10 = $recall")
  }

  test("scaled beam search: IVF-seeded recall >= 0.95 @ 20k vectors") {
    // VERDICT r11 task 4: the toy (400-node) recall spec said nothing
    // about navigability at scale — lowest-id entries measured 0.10
    // recall@10 on a 20k-node graph (BeamScale r12 sweep) because a
    // flat kNN graph has only short links. The IVF-probe seeding must
    // hold recall at the scaled size: 20k clustered vectors, a
    // within-cluster candidate pool (the graph-quality control — the
    // LSH-pool composition is pinned on the real corpus by the spec
    // below), sqrt(n) entry cells, beam=16/hops=3. Measured 1.00;
    // pinned at 0.95.
    val rnd = new scala.util.Random(7)
    val dim = 16; val clusters = 64; val n = 20000
    val centers = Array.fill(clusters, dim)(rnd.nextGaussian())
    val rows = (0 until n).map { i =>
      (i.toLong, i % clusters,
        centers(i % clusters).map(x => x + 0.15 * rnd.nextGaussian()).toSeq)
    }
    val emb = Ann.withNorm(rows.toDF("vec_id", "cl", "e")).cache()
    emb.count()
    val a = emb.select(col("vec_id").as("v1"), col("cl"), col("e").as("e1"), col("nrm").as("n1"))
    val b = emb.select(col("vec_id").as("v2"), col("cl"), col("e").as("e2"), col("nrm").as("n2"))
    val pool = a.join(b, Seq("cl")).filter(col("v1") < col("v2"))
      .withColumn("cosine",
        graft.functions.Port.r(Ann.dot(col("e1"), col("e2")) / (col("n1") * col("n2")), 6))
      .select("v1", "v2", "cosine")
    val res = Ann.graphBeamTopK(emb.select("vec_id", "e", "nrm"), pool,
      nQueries = 50, k = 10, beam = 16, hops = 3,
      entryCells = Ann.defaultCells(n))
    val got = res.select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Ann.bruteTopK(emb.select("vec_id", "e", "nrm"), 50, 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val recall = brute.count(got.contains).toDouble / brute.length
    assert(recall >= 0.95, s"scaled seeded beam recall@10 = $recall")
    emb.unpersist(blocking = false)
  }

  test("q_ann_beam_topk over the LSH-pool graph retrieves real neighbors") {
    val rows = graft.operators.AnnPack.queries("q_ann_beam_topk")(spark, TestSpark.Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq === (1L to rs.length).toSeq)
      rs.foreach(r => assert(r.getLong(1) !== q, "no self-references"))
    }
    // on the isotropic corpus the sharp check is exactness of what IS
    // returned, plus a measured recall floor vs brute force (the planted
    // near-dups are strong edges in the LSH pool, so the graph walk must
    // find a real fraction of the true top-10)
    val brute = Ann.bruteTopK(graft.operators.Ann.withNorm(
      Tables.embeddings(spark, TestSpark.Sf)
        .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("e"))),
      nQueries = 10, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("cosine")))
    val bruteCos = brute.map { case (q, v, c) => (q, v) -> c }.toMap
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      // any beam hit that IS a true top-10 member must carry the exact cosine
      bruteCos.get((r.getLong(0), r.getLong(1))).foreach { c =>
        assert(r.getAs[Double]("cosine") === c, "cosine must match brute force bit-for-bit")
      }
    }
    val recall = brute.count { case (q, v, _) => got.contains((q, v)) }.toDouble / brute.length
    assert(recall >= 0.3, s"LSH-pool beam recall@10 = $recall")
  }

  test("IVF recall curve at k ~ sqrt(n): recall rises with nprobe in {1,2,4}") {
    val rnd = new scala.util.Random(7)
    val dim = 16; val clusters = 20; val n = 400
    val centers = Array.fill(clusters, dim)(rnd.nextGaussian())
    val rows = (0 until n).map { i =>
      (i.toLong, centers(i % clusters).map(x => x + 0.15 * rnd.nextGaussian()).toSeq)
    }
    val emb = Ann.withNorm(rows.toDF("vec_id", "e")).cache()
    assert(Ann.defaultCells(n) == 20) // sqrt(400)
    val brute = Ann.bruteTopK(emb, nQueries = 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val recalls = Seq(1, 2, 4).map { np =>
      val ivf = Ann.ivfTopKAuto(emb, nQueries = 10, k = 5, nprobe = np)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      brute.count(ivf.contains).toDouble / brute.length
    }
    assert(recalls(0) <= recalls(1) + 1e-9 && recalls(1) <= recalls(2) + 1e-9,
      s"recall curve should be nondecreasing in nprobe: $recalls")
    assert(recalls(2) >= 0.9, s"recall@5 with nprobe=4: ${recalls(2)}")
    assert(recalls(1) >= 0.8, s"recall@5 with nprobe=2: ${recalls(1)}")
    // the deploy-scale path: a catalog-stat size hint must produce the
    // same plan as the counted corpus (no scan-before-plan count job)
    val hinted = Ann.ivfTopKAuto(emb, nQueries = 10, k = 5, nprobe = 2,
      corpusSizeHint = Some(n.toLong))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val counted = Ann.ivfTopK(emb, nQueries = 10, k = 5, cells = Ann.defaultCells(n), nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hinted == counted)
  }

  test("IVF on the isotropic test corpus: shape, planted near-dups retrieved, cosines exact") {
    val emb = Ann.withNorm(Tables.embeddings(spark, TestSpark.Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))).cache()
    val ivf = Ann.ivfTopK(emb, nQueries = 10, k = 5, cells = 8, nprobe = 2).collect()
    assert(ivf.length == 50) // 10 queries x full 5 (cells hold ~60 vectors)
    val ivfPairs = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfCos = ivf.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val brute = Ann.bruteTopK(emb, nQueries = 10, k = 10).collect()
    // brute-force cosines are the truth: any overlap must agree exactly
    brute.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      ivfCos.get(key).foreach(c => assert(c == r.getDouble(2)))
    }
    // planted near-duplicates (cosine >= 0.35): a ~0.38-cosine pair CAN
    // straddle a cell boundary on isotropic data (no margin), so assert
    // the measured deterministic recall floor, not perfection (6/7 here)
    val planted = brute.filter(_.getDouble(2) >= 0.35).map(r => (r.getLong(0), r.getLong(1)))
    assert(planted.nonEmpty)
    val plantedRecall = planted.count(ivfPairs.contains).toDouble / planted.length
    assert(plantedRecall >= 0.8, s"planted-pair recall = $plantedRecall of ${planted.length}")
  }

  test("two-level top-k is split-independent (brute and IVF, 1 vs 7 partitions)") {
    // bruteTopK/ivfTopK take local winners per spark_partition_id before
    // the global rank — any disjoint split's top-k contains every global
    // top-k member, so the RESULT must not depend on the input's
    // partitioning. Pin it: same data, radically different splits.
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map(i => (i.toLong, Seq.fill(16)(rnd.nextGaussian())))
    def run(parts: Int) = {
      val emb = Ann.withNorm(rows.toDF("vec_id", "e").repartition(parts)).cache()
      try {
        val b = Ann.bruteTopK(emb, nQueries = 5, k = 7).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
        val i = Ann.ivfTopK(emb, nQueries = 5, k = 4, cells = 6, nprobe = 2).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
        (b, i)
      } finally emb.unpersist()
    }
    val (b1, i1) = run(1)
    val (b7, i7) = run(7)
    assert(b1 == b7, "bruteTopK result depends on input partitioning")
    assert(i1 == i7, "ivfTopK result depends on input partitioning")
  }

  test("PQ ADC search recalls exact inner-product neighbors on clustered data") {
    val rnd = new scala.util.Random(11)
    val dim = 16; val clusters = 8; val n = 400
    val centers = Array.fill(clusters, dim)(rnd.nextGaussian())
    val rows = (0 until n).map { i =>
      (i.toLong, centers(i % clusters).map(x => x + 0.15 * rnd.nextGaussian()).toSeq)
    }
    val emb = Ann.withNorm(rows.toDF("vec_id", "e")).cache()
    val (codes, _) = Ann.pqCodebooks(emb, m = 4, dsub = 4, k = 8)
    // every vector compresses to exactly m codes, all inside the codebook
    assert(codes.count() === n.toLong * 4)
    assert(codes.filter(col("code") < 0 || col("code") >= 8).count() === 0)
    val pq = Ann.pqTopK(emb, nQueries = 10, k = 5, m = 4, dsub = 4, cells = 8).collect()
    assert(pq.length === 50)
    pq.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq === (1L to 5L))
    }
    // with k=8 codewords per subspace on 8-cluster data, every same-
    // cluster member quantizes to ~the same codes: ADC retrieves at
    // CLUSTER granularity (within-cluster order falls to the vec_id
    // tiebreak — finer ranking needs a bigger codebook, next assert).
    // So the sharp guarantee is same-cluster precision, not point recall.
    val sameCluster = pq.count(r => r.getLong(1) % clusters == r.getLong(0) % clusters)
    assert(sameCluster >= 45, s"same-cluster precision $sameCluster/50")
    // quantization refinement: mean reconstruction L2 must fall as the
    // codebook grows 8 -> 32 entries per subspace
    def reconErr(kk: Int): Double = {
      val (codes, books) = Ann.pqCodebooks(emb, m = 4, dsub = 4, k = kk)
      val sv = Ann.pqSubvectors(emb, m = 4, dsub = 4)
      val err = sv.join(codes, Seq("vec_id", "sub"))
        .join(books.select(col("sub"), col("cell").as("code"), col("cv")), Seq("sub", "code"))
        .select(aggregate(zip_with(col("sv"), col("cv"),
          (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x).as("e2"))
        .agg(avg(col("e2"))).head.getDouble(0)
      codes.unpersist(); books.unpersist()
      err
    }
    val (e8, e32) = (reconErr(8), reconErr(32))
    assert(e32 < e8, s"recon error must shrink with codebook size: k=8 $e8 vs k=32 $e32")
    // split-independence: the two-level rank and all aggregates must not
    // depend on input partitioning
    val emb7 = Ann.withNorm(rows.toDF("vec_id", "e").repartition(7)).cache()
    val pq7 = Ann.pqTopK(emb7, nQueries = 10, k = 5, m = 4, dsub = 4, cells = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(pq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq === pq7)
    emb.unpersist(); emb7.unpersist()
  }

  test("IVF-PQ: residual coding refines plain PQ and probing prunes to probed cells") {
    val rnd = new scala.util.Random(29)
    val dim = 16; val clusters = 8; val n = 400
    val centers = Array.fill(clusters, dim)(rnd.nextGaussian())
    val rows = (0 until n).map { i =>
      (i.toLong, centers(i % clusters).map(x => x + 0.15 * rnd.nextGaussian()).toSeq)
    }
    val emb = Ann.withNorm(rows.toDF("vec_id", "e")).cache()
    val res = Ann.ivfPqTopK(emb, nQueries = 10, k = 5,
      cells = clusters, m = 4, dsub = 4, pqK = 8).collect()
    assert(res.length === 50)
    res.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq === (1L to 5L))
    }
    // residual PQ encodes the within-cluster noise plain PQ throws away:
    // exact-MIPS recall must beat the cluster-granularity PQ result
    // (whose recall collapses to the vec_id tiebreak, ~0.1 here)
    val vecs = rows.toMap
    val brute = (0 until 10).flatMap { q =>
      val qv = vecs(q.toLong)
      rows.filter(_._1 != q.toLong)
        .map { case (id, v) => (id, v.zip(qv).map { case (a, b) => a * b }.sum) }
        .sortBy { case (id, d) => (-d, id) }.take(5)
        .map { case (id, _) => (q.toLong, id) }
    }
    val got = res.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(got.contains).toDouble / brute.length
    assert(recall >= 0.25, s"IVF-PQ recall@5 = $recall (plain PQ sits at ~0.1 here)")
    // the codebook-size knob: 32-entry residual codebooks must recall
    // strictly more of the exact top-5 than 8-entry ones (measured here:
    // 0.30 -> ~0.8)
    val got32 = Ann.ivfPqTopK(emb, nQueries = 10, k = 5,
      cells = clusters, m = 4, dsub = 4, pqK = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall32 = brute.count(got32.contains).toDouble / brute.length
    assert(recall32 > recall && recall32 >= 0.5,
      s"recall must rise with codebook size: pqK=8 $recall vs pqK=32 $recall32")
    // split-independence
    val emb7 = Ann.withNorm(rows.toDF("vec_id", "e").repartition(7)).cache()
    val res7 = Ann.ivfPqTopK(emb7, nQueries = 10, k = 5,
      cells = clusters, m = 4, dsub = 4, pqK = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(res.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq === res7)
    emb.unpersist(); emb7.unpersist()
  }

  test("int8 quantization saturates exactly at the abs-max and reconstructs within half a step") {
    val out = graft.operators.AnnPack.queries("q_embed_quantize")(spark, TestSpark.Sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nd = r.getAs[Long]("n_dims")
      val scale = r.getAs[Double]("scale9")
      assert(nd === 64L)
      // the abs-max component maps to exactly +/-127 -> at least one
      // saturated code per nonzero vector, and codes never exceed 127
      // (l1 bound: 64 components x 127)
      if (scale > 0) assert(r.getAs[Long]("n_sat") >= 1L)
      assert(r.getAs[Long]("code_l1") <= nd * 127)
      assert(math.abs(r.getAs[Long]("code_sum")) <= r.getAs[Long]("code_l1"))
      // rounding-to-nearest: per-dim error <= scale/2, so the integer
      // picounit error sum is bounded by n_dims*(scale/2)^2*1e12 (+1/dim
      // floor slack)
      // scale9 under-reports the true scale by < 1e-9 (snapping)
      val up = scale + 1e-9
      val bound = nd * ((up / 2) * (up / 2) * 1e12 + 1)
      assert(r.getAs[Long]("err_u") <= bound,
        s"vec ${r.getAs[Long]("vec_id")}: err ${r.getAs[Long]("err_u")} > $bound")
    }
  }

  test("topic balance covers the corpus with valid purity bounds") {
    val out = graft.operators.AnnPack.queries("q_topic_balance")(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    val n = Tables.embeddings(spark, TestSpark.Sf).count()
    assert(out.map(_.getAs[Long]("n_members")).sum === n, "cells must partition the corpus")
    out.foreach { r =>
      val top = r.getAs[Long]("top_label_n")
      val members = r.getAs[Long]("n_members")
      assert(top >= 1 && top <= members)
      val p = r.getAs[Double]("purity")
      assert(p > 0 && p <= 1.0)
      // the majority label must hold at least the uniform share
      assert(top * 10 >= members, "top label below 1/10 cannot be the majority of 10 labels")
    }
  }

  test("semdedup pairs live in one shared cell with brute-force-exact cosines") {
    val pairs = graft.operators.AnnPack.queries("q_dedup_semantic")(spark, TestSpark.Sf)
      .collect()
    assert(pairs.nonEmpty, "the test corpus plants same-cell near-dups")
    // recompute every returned cosine brute-force from the raw vectors
    val vecs = Tables.embeddings(spark, TestSpark.Sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    pairs.foreach { r =>
      val (v1, v2) = (r.getAs[Long]("v1"), r.getAs[Long]("v2"))
      assert(v1 < v2)
      val (a, b) = (vecs(v1), vecs(v2))
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val c = d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      val snapped = math.floor(c * 1e6 + 0.5) / 1e6
      assert(snapped >= 0.35)
      assert(math.abs(r.getAs[Double]("cosine") - snapped) < 1e-9,
        s"pair ($v1,$v2): engine cosine != brute force")
    }
  }

  test("semanticClusters partitions the corpus and is split-independent") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (0 until 240).map(i => (i.toLong, Seq.fill(16)(rnd.nextGaussian())))
    def run(parts: Int) = {
      val emb = Ann.withNorm(rows.toDF("vec_id", "e").repartition(parts)).cache()
      try Ann.semanticClusters(emb, cells = 9).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
      finally emb.unpersist()
    }
    val a = run(1)
    // every vector lands in exactly one cell, means/mins are valid cosines
    assert(a.map(_._2).sum == 240L, "cells must partition the corpus")
    assert(a.forall { case (_, _, mean, mn) =>
      mn >= -1.0000005 && mean <= 1.0000005 && mn <= mean })
    // exact-integer aggregation: result independent of input splits
    assert(a == run(5), "semanticClusters result depends on input partitioning")
  }
}
