package graft

import graft.operators.RetrievalPack
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Retrieval operators: BM25 lexical search, the LSH kNN graph, and
  * reciprocal-rank hybrid fusion. The oracle pins exact values; these
  * specs pin the semantic invariants a hash can't explain: containment,
  * rank monotonicity, the exact integer RRF formula, and a brute-force
  * BM25 recomputation in plain Scala.
  */
class RetrievalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.Sf

  test("bm25 top-k contains only term-matching docs, ranked by recomputed scores") {
    val rows = RetrievalPack.queries("q_bm25_topk")(spark, d).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // ranks are 1..n in order, scores non-increasing
    assert(rows.map(_.getAs[Long]("rank")).toSeq === (1L to rows.length).toSeq)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("score_u") >= b.getAs[Long]("score_u"))
    }
    // brute-force recomputation of every returned score in plain Scala
    val docs = Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val nDocs = docs.size
    val avgdl = docs.values.map(_.size.toLong).sum.toDouble / nDocs
    val dfMap = RetrievalPack.QueryTerms.map(t =>
      t -> docs.values.count(_.contains(t)).toLong).toMap
    rows.foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id"))
      val dl = toks.size.toDouble
      val hits = RetrievalPack.QueryTerms.filter(toks.contains)
      assert(r.getAs[Long]("n_hit_terms") === hits.size.toLong)
      val expected = hits.map { t =>
        val tf = toks.count(_ == t).toDouble
        val df = dfMap(t).toDouble
        math.floor(math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0) *
          ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) * 1e6 + 0.5).toLong
      }.sum
      assert(r.getAs[Long]("score_u") === expected,
        s"doc ${r.getAs[Long]("doc_id")}: engine score != brute force")
    }
  }

  test("knn graph ranks each node's LSH candidates by cosine with symmetric edge scores") {
    val g = RetrievalPack.queries("q_knn_graph")(spark, d).collect()
    assert(g.nonEmpty)
    g.groupBy(_.getAs[Long]("vec_id")).foreach { case (v, nbrs) =>
      val sorted = nbrs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq === (1L to nbrs.length).toSeq)
      assert(nbrs.length <= 3)
      assert(nbrs.map(_.getAs[Long]("nbr")).distinct.length === nbrs.length)
      assert(!nbrs.map(_.getAs[Long]("nbr")).contains(v), "no self-edges")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("cosine") >= b.getAs[Double]("cosine"))
        case _ => ()
      }
    }
    // an undirected edge scores identically from both endpoints
    val byPair = g.map(r => (Set(r.getAs[Long]("vec_id"), r.getAs[Long]("nbr")),
      r.getAs[Double]("cosine"))).groupBy(_._1)
    byPair.values.foreach(cs => assert(cs.map(_._2).distinct.length === 1))
  }

  test("graph rank conserves bounded mass with the teleport floor") {
    val rows = RetrievalPack.queries("q_graph_rank")(spark, d).collect()
    val n = Tables.embeddings(spark, d).count()
    assert(rows.length === n, "every vector gets a rank")
    val teleport = 150000000000L / n
    rows.foreach { r =>
      val ru = r.getAs[Long]("r_u")
      assert(ru >= teleport, "teleport term is the floor")
      assert(math.abs(r.getAs[Double]("rank_score") - ru / 1e12) < 1e-15)
    }
    // total mass never exceeds the initial unit mass: integer division
    // only loses mass (dangling + truncation), never creates it
    val total = rows.map(_.getAs[Long]("r_u")).sum
    assert(total <= 1000000000000L + n, s"mass grew: $total")
    assert(total >= teleport * n)
    // presentation order is (r_u desc, vec_id)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val (ra, rb) = (a.getAs[Long]("r_u"), b.getAs[Long]("r_u"))
        assert(ra > rb || (ra == rb && a.getAs[Long]("vec_id") < b.getAs[Long]("vec_id")))
      case _ => ()
    }
  }

  test("triplet mining emits 1 pos + 5 hard + 1 rand per anchor with ordered cosines") {
    val rows = RetrievalPack.queries("q_triplet_mining")(spark, d).collect()
    val n = Tables.embeddings(spark, d).count()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet === (0L until 10L).toSet)
    byQ.foreach { case (q, rs) =>
      val byLabel = rs.groupBy(_.getAs[String]("label")).view.mapValues(_.toSeq).toMap
      assert(byLabel("pos").size === 1)
      assert(byLabel("hard_neg").size === 5)
      assert(byLabel("rand_neg").size === 1)
      // the positive is the nearest neighbor: at least as close as every hard negative
      val posCos = byLabel("pos").head.getAs[Double]("cosine")
      byLabel("hard_neg").foreach(h => assert(posCos >= h.getAs[Double]("cosine")))
      // deterministic hash-argmin partner over the observed id set
      val ids = Tables.embeddings(spark, d).select("vec_id").collect().map(_.getLong(0))
      val expected = ids.filter(_ != q).minBy(v => (md5hex(s"$q#$v"), v))
      assert(byLabel("rand_neg").head.getAs[Long]("vec_id") === expected)
      rs.foreach(r => assert(r.getAs[Long]("vec_id") !== q, "no self-references"))
    }
    assert(n > 0)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("random-negative partners exist and are self-free on sparse id spaces") {
    // the r10 defect class: LCG over raw ids dropped 9/10 partners on a
    // sparse (replica-style) id space and could self-pair on unlucky
    // corpus sizes. The hash-argmin partner must produce exactly one
    // non-self partner per anchor on ANY id space.
    import spark.implicits._
    // sparse ids: anchors 0-9 present, the rest scattered with big gaps
    val ids = (0L until 10L) ++ Seq(37L, 1000L, 99991L, 123456789L, 7L * 7919L + 37L)
    val emb = graft.operators.Ann.withNorm(
      ids.map(i => (i, (i % 7).toInt, Array.fill(4)(1.0 + (i % 5)))).toSeq
        .toDF("vec_id", "label", "e"))
    val partners = graft.operators.RetrievalPack.randomNegativePartners(emb)
      .collect().map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("vec_id"))
    assert(partners.length === 10, "every anchor gets exactly one partner")
    partners.foreach { case (q, p) =>
      assert(p !== q, s"self-pair for anchor $q")
      assert(ids.contains(p), "partner drawn from the observed id set")
      val expected = ids.filter(_ != q).minBy(v => (md5hex(s"$q#$v"), v))
      assert(p === expected, s"partner for $q is the deterministic hash argmin")
    }
  }

  test("knn purity partitions edges by label with exact integer counts") {
    val rows = RetrievalPack.queries("q_knn_purity")(spark, d).collect()
    assert(rows.nonEmpty)
    val graphEdges = RetrievalPack.queries("q_knn_graph")(spark, d).count()
    assert(rows.map(_.getAs[Long]("n_edges")).sum === graphEdges,
      "purity table accounts for every graph edge")
    rows.foreach { r =>
      val nNodes = r.getAs[Long]("n_nodes")
      val nEdges = r.getAs[Long]("n_edges")
      val nSame = r.getAs[Long]("n_same_label")
      assert(nEdges >= nNodes && nEdges <= 3 * nNodes, "1..3 edges per node")
      assert(nSame >= 0 && nSame <= nEdges)
      val p = r.getAs[Double]("purity")
      assert(p >= 0.0 && p <= 1.0)
      assert(math.abs(p - math.floor(nSame.toDouble / nEdges * 1e6 + 0.5) / 1e6) < 1e-12)
    }
  }

  test("rrf fusion scores are the exact integer formula over the two rank lists") {
    val rows = RetrievalPack.queries("q_rrf_hybrid")(spark, d).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet === (0L until 10L).toSet)
    byQ.foreach { case (_, rs) =>
      assert(rs.length <= 5)
      assert(rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("rank")).toSeq
        === (1L to rs.length).toSeq)
      rs.foreach { r =>
        val lex = r.getAs[Long]("lex_rank")
        val vec = r.getAs[Long]("vec_rank")
        assert(lex > 0 || vec > 0, "fused docs must come from some list")
        assert(lex <= 10 && vec <= 10)
        val expected = (if (lex > 0) 1000000000L / (60L + lex) else 0L) +
          (if (vec > 0) 1000000000L / (60L + vec) else 0L)
        assert(r.getAs[Long]("rrf_u") === expected)
      }
      // fused ranking is non-increasing in rrf_u
      rs.sortBy(_.getAs[Long]("rank")).sliding(2).foreach {
        case Array(a, b) => assert(a.getAs[Long]("rrf_u") >= b.getAs[Long]("rrf_u"))
        case _ => ()
      }
    }
  }

  test("knn degree stats conserve vectors and edges vs the graph query") {
    import org.apache.spark.sql.functions._
    val stats = SparkEntry.queries("q_knn_degree_stats")(spark, d).collect()
      .map(r => r.getAs[Long]("indeg") -> r.getAs[Long]("n_vectors"))
    val nVec = spark.read.parquet(s"$d/embeddings.parquet").count()
    assert(stats.map(_._2).sum === nVec, "every vector lands in one bucket")
    val edges = SparkEntry.queries("q_knn_graph")(spark, d).count()
    assert(stats.map(t => t._1 * t._2).sum === edges,
      "in-degree mass equals the edge count")
  }
}
