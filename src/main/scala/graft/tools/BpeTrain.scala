package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** One-off trainer for the frozen BPE merge table (r14 verdict task 7):
  * trains to EXHAUSTION on the corpus vocabulary and prints the merge
  * sequence as a Scala literal for Bpe.TrainedMerges, plus per-merge
  * wall time. Run: `sbt "runMain graft.tools.BpeTrain /root/testdata/sf0.01 512"`.
  *
  * Note the structural ceiling: the synthetic corpus has 31 distinct
  * whitespace tokens totalling 138 characters, so the merge capacity is
  * Σ(len−1) = 107 — training exhausts (no pair occurs twice) well below
  * the verdict's nominal 256; the frozen table is the COMPLETE merge
  * sequence of this corpus, not a truncation.
  */
object BpeTrain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cap = args.lift(1).map(_.toInt).getOrElse(512)
    val spark = GraftSession.get("graft-bpe-train")
    val vocab = Tables.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) >= 1)
      .groupBy("tok").agg(count(lit(1)).as("freq"))
    val t0 = System.nanoTime()
    val (merges, fin) = Bpe.train(vocab, cap)
    val secs = (System.nanoTime() - t0) / 1e9
    val finalSyms = fin.agg(sum(size(col("syms")))).head().getLong(0)
    println(s"// trained ${merges.size} merges in ${f"$secs%.1f"} s " +
      s"(${f"${secs / merges.size}%.3f"} s/merge); final symbol count $finalSyms")
    println("val TrainedMerges: Seq[(String, String)] = Seq(")
    println(merges.grouped(4).map(g =>
      "    " + g.map { case (a, b) => s"""("$a", "$b")""" }.mkString(", "))
      .mkString(",\n") + ")")
    spark.stop()
  }
}
