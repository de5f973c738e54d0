package graft

import graft.operators.CorpusPack
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the corpus-preparation operators (CorpusPack). The
  * value-level correctness lives in the DuckDB oracles; these pin the
  * semantic properties a hash compare can't express.
  */
class CorpusSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.Sf

  test("decontaminate covers exactly the non-eval corpus and flags consistently") {
    val out = CorpusPack.queries("q_decontaminate")(s, d).cache()
    val evalIds = Tables.documents(s, d)
      .filter(col("source") === CorpusPack.EvalSource)
      .select("doc_id")
    assert(out.join(evalIds, "doc_id").count() === 0, "eval docs must not be scored")
    assert(out.filter(col("n_hit_shingles") > col("n_shingles")).count() === 0)
    assert(out.filter(
      (col("contaminated") === 1) =!= (col("n_hit_shingles") > 0)).count() === 0)
    // every corpus doc long enough to have a 5-gram gets a row
    val corpusDocs = Tables.documents(s, d)
      .filter(col("source") =!= CorpusPack.EvalSource)
      .filter(size(split(col("text"), " ")) >= 5)
      .count()
    assert(out.count() === corpusDocs)
    out.unpersist()
  }

  test("eval coverage scores exactly the eval docs with bounded coverage") {
    val out = CorpusPack.queries("q_eval_coverage")(s, d).cache()
    val evalDocs = Tables.documents(s, d)
      .filter(col("source") === CorpusPack.EvalSource)
      .filter(size(split(col("text"), " ")) >= 5)
    assert(out.count() === evalDocs.count(), "one row per 5-grammable eval doc")
    assert(out.join(evalDocs.select("doc_id"), "doc_id").count() === out.count())
    assert(out.filter(col("n_covered") > col("n_shingles")).count() === 0)
    assert(out.filter(col("coverage") < 0 || col("coverage") > 1).count() === 0)
    out.unpersist()
  }

  test("pii scrub finds numeric payload ids and collapses the payload space") {
    val out = CorpusPack.queries("q_pii_scrub")(s, d).cache()
    assert(out.filter(col("num_hits") <= 0).count() === 0, "props payloads carry numeric ids")
    // redaction must strictly collapse the payload space
    assert(out.filter(col("n_distinct_redacted") >= col("n_distinct_raw")).count() === 0)
    out.unpersist()
  }

  test("stratified sample is deterministic and lands near the target rates") {
    val q = CorpusPack.queries("q_sample_stratified")
    val a = q(s, d).collect().map(_.getLong(0)).toSeq
    val b = q(s, d).collect().map(_.getLong(0)).toSeq
    assert(a === b, "hash sampling must be run-stable")
    val perLang = q(s, d).groupBy("lang").agg(count(lit(1)).as("kept"))
      .join(Tables.documents(s, d).groupBy("lang").agg(count(lit(1)).as("n")), "lang")
      .collect()
    perLang.foreach { r =>
      val rate = r.getAs[Long]("kept").toDouble / r.getAs[Long]("n")
      val target = if (r.getAs[String]("lang") == "en") 0.4 else 0.8
      assert(math.abs(rate - target) < 0.2,
        s"${r.getAs[String]("lang")}: rate $rate vs target $target")
    }
  }

  test("length histogram shares integrate to one per source") {
    val out = CorpusPack.queries("q_length_histogram")(s, d).cache()
    val bad = out.groupBy("source")
      .agg(sum(col("share")).as("tot"), max(col("cum_share")).as("last"))
      .filter(abs(col("tot") - 1.0) > 1e-9 || col("last") =!= 1.0)
    assert(bad.count() === 0)
    out.unpersist()
  }

  test("corpus mix never over-allocates and spends within budget") {
    val rows = CorpusPack.queries("q_corpus_mix")(s, d).collect()
    val avail = rows.map(r => r.getAs[Long]("avail_tokens")).sum
    val budget = avail * 6 / 10
    rows.foreach { r =>
      assert(r.getAs[Long]("final_alloc") <= r.getAs[Long]("avail_tokens"))
      assert(r.getAs[Double]("sample_rate") <= 1.0)
    }
    assert(rows.map(_.getAs[Long]("final_alloc")).sum <= budget)
  }

  test("shard manifest covers every doc exactly once with consistent hash ranges") {
    val out = CorpusPack.queries("q_shard_manifest")(s, d).collect()
    val nDocs = Tables.documents(s, d).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === nDocs, "every doc lands in one shard")
    out.foreach { r =>
      val shard = r.getAs[Long]("shard")
      assert(shard >= 0 && shard < CorpusPack.NShards)
      assert(r.getAs[Long]("min_h") <= r.getAs[Long]("max_h"))
      // the hash range really belongs to this shard
      assert(r.getAs[Long]("min_h") % CorpusPack.NShards === shard)
      assert(r.getAs[Long]("max_h") % CorpusPack.NShards === shard)
      assert(r.getAs[Long]("id_checksum") >= 0 &&
        r.getAs[Long]("id_checksum") < CorpusPack.ChecksumP)
    }
    // md5 balance: no shard may dominate (loose 3x-of-mean bound)
    val mean = nDocs.toDouble / out.length
    assert(out.map(_.getAs[Long]("n_docs")).max < 3 * mean,
      "hash sharding must stay balanced")
  }

  test("temperature mix flattens the source distribution monotonically") {
    val rows = CorpusPack.queries("q_mix_temperature")(s, d).collect()
    val total = rows.map(_.getAs[Long]("avail_tokens")).sum
    val budget = total * 6 / 10
    val alloc = rows.map(_.getAs[Long]("alloc_tokens")).sum
    // allocations spend the budget up to per-source floor loss
    assert(alloc <= budget && alloc > budget - rows.length)
    // alpha=0.5: sample_rate ~ 1/sqrt(avail) — strictly anti-monotone in
    // availability (rare sources get upsampled hardest)
    val byAvail = rows.sortBy(_.getAs[Long]("avail_tokens"))
    byAvail.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("sample_rate") >= b.getAs[Double]("sample_rate"),
        s"${a.getString(0)} vs ${b.getString(0)}: rate must fall as availability rises")
    }
    // weights really are the snapped sqrt shares
    rows.foreach { r =>
      val w = math.floor(math.sqrt(
        r.getAs[Long]("avail_tokens").toDouble / total) * 1e12 + 0.5).toLong
      assert(r.getAs[Long]("weight_u") === w)
    }
  }

  test("eval split is exhaustive, content-stable and near the 90/5/5 target") {
    val out = CorpusPack.queries("q_eval_split")(s, d).collect()
    val total = out.map(_.getAs[Long]("n_docs")).sum
    assert(total === Tables.documents(s, d).count(), "every doc lands in one split")
    val bySplit = out.groupBy(_.getString(1)).view.mapValues(_.map(_.getAs[Long]("n_docs")).sum)
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    val trainShare = bySplit.getOrElse("train", 0L).toDouble / total
    assert(math.abs(trainShare - 0.9) < 0.05, s"train share $trainShare")
    // determinism: re-running yields the identical manifest
    assert(CorpusPack.queries("q_eval_split")(s, d).collect().toSeq === out.toSeq)
  }

  test("quality deciles partition the corpus into ordered non-overlapping bins") {
    val rows = CorpusPack.queries("q_quality_deciles")(s, d).collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_.getAs[Long]("decile")).forall(k => k >= 1 && k <= 10))
    assert(rows.map(_.getAs[Long]("n_docs")).sum === Tables.documents(s, d).count(),
      "every doc lands in exactly one decile")
    // bins are value-ordered and never overlap (equal scores share a bin)
    rows.foreach(r =>
      assert(r.getAs[Double]("min_q") <= r.getAs[Double]("max_q")))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("decile") < b.getAs[Long]("decile"))
        assert(a.getAs[Double]("max_q") < b.getAs[Double]("min_q"))
      case _ => ()
    }
  }

  test("source overlap matrix is bounded by its marginals") {
    val rows = CorpusPack.queries("q_source_overlap")(s, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "upper-triangle pairs only")
      val shared = r.getAs[Long]("n_shared")
      assert(shared >= 1)
      assert(shared <= math.min(r.getAs[Long]("src1_shingles"), r.getAs[Long]("src2_shingles")))
      val j = r.getAs[Double]("jaccard")
      assert(j > 0 && j <= 1.0)
    }
  }

  test("padding waste is nondecreasing as the context length doubles") {
    // per doc, waste(L) = (-n) mod L, and (-n mod 2L) is (-n mod L) or
    // (-n mod L) + L — so each source's waste must not fall 512->1024->2048
    val rows = CorpusPack.queries("q_padding_waste")(s, d).collect()
      .groupBy(_.getString(0))
    assert(rows.nonEmpty)
    rows.foreach { case (src, rs) =>
      val byLen = rs.sortBy(_.getAs[Long]("ctx_len"))
      assert(byLen.map(_.getAs[Long]("ctx_len")).toSeq === Seq(512L, 1024L, 2048L))
      byLen.sliding(2).foreach { case Array(a, b) =>
        assert(a.getAs[Long]("padded_tokens") <= b.getAs[Long]("padded_tokens"),
          s"$src: waste fell when the context doubled")
      }
      // contexts shrink (or hold) as L grows; token mass is L-invariant
      byLen.sliding(2).foreach { case Array(a, b) =>
        assert(a.getAs[Long]("n_contexts") >= b.getAs[Long]("n_contexts"))
        assert(a.getAs[Long]("n_tokens") === b.getAs[Long]("n_tokens"))
      }
    }
  }

  test("chunking covers every token with exact 32-token overlap on long docs") {
    import org.apache.spark.sql.SparkSession
    val sp = s; import sp.implicits._
    // synthetic docs spanning the edge cases: 1, 32, 33, 96, 128, 129,
    // 224, 225, 1000 tokens (the corpus docs are mostly single-chunk)
    val sizes = Seq(1, 32, 33, 96, 128, 129, 224, 225, 1000)
    val docs = sizes.zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(t => s"t$t").mkString(" "), "en", "src0", n.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("chunks").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusPack.queries("q_chunk_docs")(s, dir).collect()
    sizes.zipWithIndex.foreach { case (n, i) =>
      val chunks = out.filter(_.getLong(0) == i.toLong).sortBy(_.getAs[Long]("chunk_id"))
      val expected = math.max(1, (n + 63) / 96)
      assert(chunks.length === expected, s"doc of $n tokens")
      // stride-96 starts, last chunk ends exactly at n, all sizes in [1, 128]
      chunks.zipWithIndex.foreach { case (c, j) =>
        assert(c.getAs[Long]("tok_start") === j * 96L)
        assert(c.getAs[Long]("n_tokens") >= 1 && c.getAs[Long]("n_tokens") <= 128)
      }
      val last = chunks.last
      assert(last.getAs[Long]("tok_start") + last.getAs[Long]("n_tokens") === n.toLong,
        s"doc of $n tokens must be covered to its end")
      // consecutive chunks overlap by exactly 32 when the earlier one is full
      chunks.sliding(2).foreach {
        case Array(a, b) =>
          if (a.getAs[Long]("n_tokens") == 128)
            assert(a.getAs[Long]("tok_start") + 128 - b.getAs[Long]("tok_start") === 32L)
        case _ =>
      }
      // fingerprints of distinct slices are distinct
      assert(chunks.map(_.getAs[String]("chunk_md5")).distinct.length === chunks.length)
    }
  }

  test("chunk dedup finds planted duplicate chunks and separates cross-doc from in-doc") {
    val sp = s; import sp.implicits._
    val block = (0 until 64).map(t => s"d$t").mkString(" ")   // one full chunk
    val other = (0 until 64).map(t => s"u$t").mkString(" ")
    val docs = Seq(
      // doc 0: the block twice (in-doc dup: chunks 0 and 1 identical)
      (0L, s"$block $block", "en", "srcA", 0L),
      // doc 1: the block once (cross-doc dup with doc 0)
      (1L, block, "en", "srcA", 0L),
      // doc 2: unique content, no dups
      (2L, other, "en", "srcB", 0L))
    val dir = java.nio.file.Files.createTempDirectory("chunkdedup").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusPack.queries("q_chunk_dedup")(s, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val a = out("srcA")
    // srcA: 3 chunk instances, all of the same fingerprint → all dups,
    // and the fingerprint spans docs 0 and 1 → cross-doc too
    assert(a.getAs[Long]("n_chunks") == 3L)
    assert(a.getAs[Long]("dup_chunks") == 3L)
    assert(a.getAs[Long]("cross_doc_dup_chunks") == 3L)
    assert(a.getAs[Long]("dup_tokens") == 192L)
    assert(a.getAs[Double]("dup_ratio") == 1.0)
    val b = out("srcB")
    assert(b.getAs[Long]("n_chunks") == 1L && b.getAs[Long]("dup_chunks") == 0L)
    assert(b.getAs[Double]("dup_ratio") == 0.0)
  }

  test("blocklist gate: strict drops any hit, soft tolerates <=2% mass, absent term never fires") {
    val out = CorpusPack.queries("q_blocklist_filter")(s, d).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, hit, terms) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_blocked"), r.getAs[Long]("n_blocked_terms"))
      assert(hit <= n && terms <= math.min(hit, CorpusPack.Blocklist.size.toLong))
      assert(r.getAs[Int]("keep_strict") == (if (hit == 0) 1 else 0))
      assert(r.getAs[Int]("keep_soft") ==
        (if (hit.toDouble / n <= 0.02) 1 else 0))
    }
    // the corpus carries both kept and dropped docs under the strict rule
    assert(out.exists(_.getAs[Int]("keep_strict") == 1))
    assert(out.exists(_.getAs[Int]("keep_strict") == 0))
    // 'spam' is absent from the corpus: no doc can hit all three terms
    assert(out.forall(_.getAs[Long]("n_blocked_terms") <= 2))
  }

  test("length quantiles equal brute-force percentile_disc per source") {
    val lens = Tables.documents(s, d)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def disc(xs: Seq[Long], num: Long, den: Long): Long = {
      val n = xs.size.toLong
      val rank = (num * n + num) / den // ceil(p*n) with p = num/den
      xs((rank - 1).toInt)
    }
    val rows = CorpusPack.queries("q_length_quantiles")(s, d).collect()
    assert(rows.length === lens.size)
    rows.foreach { r =>
      val xs = lens(r.getString(0))
      assert(r.getAs[Long]("n_docs") === xs.size.toLong)
      assert(r.getAs[Long]("p50_tokens") === disc(xs, 1, 2))
      assert(r.getAs[Long]("p90_tokens") === disc(xs, 9, 10))
      assert(r.getAs[Long]("p99_tokens") === disc(xs, 99, 100))
      assert(r.getAs[Long]("max_tokens") === xs.max)
    }
  }
}
