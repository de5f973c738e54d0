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
}
