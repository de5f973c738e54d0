package graft

import graft.operators.TextPack
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed pins for the corpus-LM and corpus-health statistics
  * (the oracles prove engine parity; these prove the DEFINITIONS).
  */
class TextStatsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("bigram logprob matches the hand-computed conditional -ln p") {
    val sp = s; import sp.implicits._
    // corpus: "a b a b a" + "a b b"
    //   c12: (a,b)=3 (b,a)=2 (b,b)=1; c1: a=3, b=3
    //   nll:  (a,b)=0, (b,a)=ln(3/2), (b,b)=ln 3
    val dir = java.nio.file.Files.createTempDirectory("bigram").toString
    Seq((0L, "a b a b a", "en", "srcA", 9L), (1L, "a b b", "en", "srcA", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextPack.queries("q_bigram_logprob")(s, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    def snap(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val nllBA = -math.log(2.0 / 3.0)
    val nllBB = -math.log(1.0 / 3.0)
    assert(out(0L).getAs[Long]("n_bigrams") == 4L)
    assert(out(0L).getAs[Double]("avg_neg_logprob2") == snap(2 * nllBA / 4))
    assert(out(0L).getAs[Double]("max_neg_logprob2") == snap(nllBA))
    assert(out(1L).getAs[Long]("n_bigrams") == 2L)
    assert(out(1L).getAs[Double]("avg_neg_logprob2") == snap(nllBB / 2))
    assert(out(1L).getAs[Double]("max_neg_logprob2") == snap(nllBB))
  }

  test("zipf slope recovers -1 on a planted power-law vocabulary") {
    val sp = s; import sp.implicits._
    // token k appears round(10000/k) times (k = 1..20, all counts
    // distinct) → ln(freq) ≈ ln 10000 − 1·ln(rank)
    val text = (1 to 20).flatMap(k =>
      Seq.fill(math.round(10000.0 / k).toInt)(f"w$k%02d")).mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("zipf").toString
    Seq((0L, text, "en", "srcZ", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextPack.queries("q_zipf_slope")(s, dir).collect().head
    assert(r.getAs[Long]("n_terms") == 20L)
    val slope = r.getAs[Double]("slope")
    assert(slope > -1.01 && slope < -0.99, s"slope $slope")
    assert(r.getAs[Double]("r2") > 0.999)
    assert(math.abs(r.getAs[Double]("intercept") - math.log(10000.0)) < 0.02)
  }

  test("token entropy: uniform vocabulary reaches ln|V| with normalized score 1") {
    val sp = s; import sp.implicits._
    // 16 tokens x 10 occurrences each -> H = ln 16, norm = 1
    val text = (0 until 16).flatMap(k => Seq.fill(10)(f"w$k%02d")).mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("entropy").toString
    Seq((0L, text, "en", "srcU", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextPack.queries("q_token_entropy")(s, dir).collect().head
    assert(r.getAs[Long]("vocab_size") == 16L)
    assert(math.abs(r.getAs[Double]("entropy") - math.log(16.0)) < 1e-5)
    assert(math.abs(r.getAs[Double]("norm_entropy") - 1.0) < 1e-5)
    // real corpus: entropy bounded by ln|V|, normalized in (0, 1]
    TextPack.queries("q_token_entropy")(s, TestSpark.Sf).collect().foreach { row =>
      val h = row.getAs[Double]("entropy")
      val hn = row.getAs[Double]("norm_entropy")
      assert(h >= 0.0 && h <= math.log(row.getAs[Long]("vocab_size").toDouble) + 1e-6)
      assert(hn > 0.0 && hn <= 1.0 + 1e-9)
    }
  }

  test("unigram kl: identical source distributions diverge by 0; a skewed source by the hand value") {
    val sp = s; import sp.implicits._
    // srcA and srcB both "a a b" -> each source's dist == corpus dist
    // -> KL = 0 exactly for both
    val dir = java.nio.file.Files.createTempDirectory("kl").toString
    Seq((0L, "a a b", "en", "srcA", 5L), (1L, "a a b", "en", "srcB", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextPack.queries("q_unigram_kl")(s, dir).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_tokens") == 3L)
      assert(r.getAs[Double]("kl") == 0.0)
    }
    // skewed: srcA = "a a a a", srcB = "b b b b" -> p(a|A)=1, q(a)=1/2
    // -> KL(A||corpus) = ln 2 for both sources (snapped per micro-term)
    val dir2 = java.nio.file.Files.createTempDirectory("kl2").toString
    Seq((0L, "a a a a", "en", "srcA", 7L), (1L, "b b b b", "en", "srcB", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val out2 = TextPack.queries("q_unigram_kl")(s, dir2).collect()
    val expect = math.floor(math.floor(4 * math.log(2.0) * 1e6 + 0.5) / (4 * 1e6)
      * 1e6 + 0.5) / 1e6
    out2.foreach(r => assert(r.getAs[Double]("kl") == expect))
  }

  test("tokenizer fertility: punctuation-heavy text pays more bpe tokens per word") {
    val sp = s; import sp.implicits._
    // en: "ab cd" -> 2 ws words, 2 bpe tokens -> fertility 1.0
    // xx: "ab, cd!" -> 2 ws words, 4 bpe tokens (ab , cd !) -> 2.0
    val dir = java.nio.file.Files.createTempDirectory("fert").toString
    Seq((0L, "ab cd", "en", "srcA", 5L), (1L, "ab, cd!", "xx", "srcA", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextPack.queries("q_tokenizer_fertility")(s, dir).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("total_ws_tokens"), r.getAs[Long]("total_bpe_tokens"),
          r.getAs[Double]("fertility"))).toMap
    assert(out("en") == ((2L, 2L, 1.0)))
    assert(out("xx") == ((2L, 4L, 2.0)))
  }

  test("lang confusion: matrix counts equal the lang_id prediction tallies with row shares") {
    val out = TextPack.queries("q_lang_confusion")(s, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    val preds = TextPack.queries("q_lang_id")(s, TestSpark.Sf).collect()
      .groupBy(r => (r.getAs[String]("true_lang"), r.getAs[String]("pred_lang")))
      .map { case (k, v) => k -> v.length.toLong }
    out.foreach { r =>
      val k = (r.getAs[String]("true_lang"), r.getAs[String]("pred_lang"))
      assert(preds(k) == r.getAs[Long]("n_docs"))
    }
    // each true_lang's shares sum to 1
    out.groupBy(_.getAs[String]("true_lang")).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_.getAs[Double]("row_share")).sum - 1.0) < 1e-9)
    }
  }

  test("gini sources: balanced mass gives 0, a 9:1 split gives 0.4") {
    val sp = s; import sp.implicits._
    // en: two sources with equal token mass -> gini 0
    // xx: source masses 1 and 9 -> G = ((2*1-3)*1 + (2*2-3)*9)/(2*10) = 0.4
    val dir = java.nio.file.Files.createTempDirectory("gini").toString
    Seq(
      (0L, "a b c", "en", "s1", 5L), (1L, "d e f", "en", "s2", 5L),
      (2L, "a", "xx", "s1", 1L),
      (3L, "a b c d e f g h i", "xx", "s2", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextPack.queries("q_gini_sources")(s, dir).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_sources"), r.getAs[Double]("gini"))).toMap
    assert(out("en") == ((2L, 0.0)))
    assert(out("xx") == ((2L, 0.4)))
  }

  test("preference pairs: the high-quality doc is chosen over the stopword-heavy one") {
    val sp = s; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pref").toString
    Seq(
      (0L, "the the the", "en", "s1", 11L),          // repetitive + all-stopword
      (1L, "alpha beta gamma", "en", "s1", 16L))     // distinct, no stopwords
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextPack.queries("q_preference_pairs")(s, dir).collect().head
    assert(r.getAs[Long]("chosen_doc_id") == 1L)
    assert(r.getAs[Long]("rejected_doc_id") == 0L)
    assert(r.getAs[Long]("n_docs") == 2L)
    assert(r.getAs[Double]("q_gap") > 0.4)
  }

  test("zipf slope is negative on every real-corpus source") {
    val out = TextPack.queries("q_zipf_slope")(s, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("slope") < 0.0, r.getAs[String]("source"))
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("dup matrix conserves the pair pool and bounds mean jaccard") {
    import org.apache.spark.sql.functions._
    val pairs = TextPack.queries("q_dedup_ngram_jaccard")(s, TestSpark.Sf).count()
    val out = TextPack.queries("q_dup_matrix")(s, TestSpark.Sf).cache()
    assert(out.agg(sum("n_pairs")).head.getLong(0) === pairs,
      "every verified pair lands in exactly one source cell")
    assert(out.filter(col("avg_jaccard") < 0.5 - 1e-6 ||
      col("avg_jaccard") > 1.0 + 1e-6).count() === 0,
      "pool threshold bounds the cell means")
    assert(out.filter(col("src1") > col("src2")).count() === 0)
    out.unpersist()
  }

  test("perplexity histogram conserves doc and token mass per source") {
    import org.apache.spark.sql.functions._
    val out = TextPack.queries("q_perplexity_histogram")(s, TestSpark.Sf).cache()
    val perSrc = out.groupBy("source")
      .agg(sum("n_docs").as("docs"), sum("n_tokens").as("toks"),
        sum("doc_share").as("share"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("docs"), r.getAs[Long]("toks"), r.getAs[Double]("share"))).toMap
    val truth = Tables.documents(s, TestSpark.Sf)
      .groupBy("source")
      .agg(count(lit(1)).as("docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("toks"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("docs"), r.getAs[Long]("toks"))).toMap
    assert(perSrc.keySet == truth.keySet)
    truth.foreach { case (src, (docs, toks)) =>
      val (d2, t2, share) = perSrc(src)
      assert(d2 == docs, s"$src doc mass")
      assert(t2 == toks, s"$src token mass")
      assert(math.abs(share - 1.0) < 1e-4, s"$src share sums to 1")
    }
    assert(out.filter(col("bin") < 0).count() === 0)
    out.unpersist()
  }
}
