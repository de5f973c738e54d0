package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed BPE trainer vs a sequential plain-Scala reference:
  * identical merge sequences and identical final symbol sequences. The
  * oracled q_bpe_pair_freqs pins step 0 cross-engine; this pins the
  * whole loop.
  */
class BpeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def sequentialTrain(words: Map[String, Long], nMerges: Int)
  : (Seq[(String, String)], Map[String, Vector[String]]) = {
    var seqs: Map[String, Vector[String]] =
      words.map { case (w, _) => w -> w.map(_.toString).toVector }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- seqs; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + words(w)
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= 2 =>
          merges += ((a, b))
          seqs = seqs.map { case (w, syms) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                out += (a + b); i += 2
              } else { out += syms(i); i += 1 }
            }
            w -> out.result()
          }
        case _ => done = true
      }
    }
    (merges.toSeq, seqs)
  }

  test("distributed BPE reproduces the sequential trainer merge-for-merge") {
    val vocab = Tables.documents(spark, TestSpark.Sf)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .cache()
    val words = vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMerges = 12

    val (gotMerges, finalSeqs) = Bpe.train(vocab, nMerges)
    val (expMerges, expSeqs) = sequentialTrain(words, nMerges)

    assert(gotMerges === expMerges, "merge sequences must match exactly")
    assert(gotMerges.nonEmpty)
    // final symbol sequences identical for EVERY word
    val got = finalSeqs.select("tok", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(got.keySet === expSeqs.keySet)
    got.foreach { case (w, syms) =>
      assert(syms === expSeqs(w), s"word '$w' diverged")
      assert(syms.mkString === w, "symbols must always concatenate back to the word")
    }
    vocab.unpersist()
  }

  test("frozen-merge encode: fertility bounded by q_tokenizer_fertility's extremes") {
    val docs = Tables.documents(spark, TestSpark.Sf)
    val enc = Bpe.encode(docs).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val words = r.getAs[Long]("n_words").toDouble
      val pieces = r.getAs[Long]("n_pieces").toDouble
      val fert = r.getAs[Double]("bpe_fertility")
      assert(pieces >= words, "a word is at least one piece")
      assert(fert == pieces / words)
    }
    // cross-check against the corpus-wide tokenizer diagnostics: BPE
    // pieces per word sit between 1 (whitespace words) and the raw
    // chars-per-word ceiling the fertility table reports
    val stats = SparkEntry.queries("q_tokenizer_fertility")(spark, TestSpark.Sf)
      .agg(sum("total_ws_tokens"), sum("total_chars")).collect()(0)
    val charsPerWord = stats.getLong(1).toDouble / stats.getLong(0)
    val totalWords = enc.map(_.getAs[Long]("n_words")).sum.toDouble
    val totalPieces = enc.map(_.getAs[Long]("n_pieces")).sum.toDouble
    val corpusFert = totalPieces / totalWords
    assert(corpusFert >= 1.0 && corpusFert <= charsPerWord,
      s"fertility $corpusFert outside [1, $charsPerWord]")
    // 16 trained merges must actually compress vs char-level encoding
    assert(corpusFert < charsPerWord * 0.9, "merges compress the corpus")
  }
}
