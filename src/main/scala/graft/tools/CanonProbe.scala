package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic: checks canonicalized-plan stability of the
  * IVF-PQ residual frame across calls (the pqCodebooksCached memo key).
  */
object CanonProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("canonprobe")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val emb = graft.operators.Ann.withNorm(graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("e"))).cache()
    val (a1, c1) = graft.operators.Ann.kmeansCellsCached(emb, 8)
    val (a2, c2) = graft.operators.Ann.kmeansCellsCached(emb, 8)
    println("PROBE kmeans same objects: " + ((a1 eq a2) && (c1 eq c2)))
    def resid() = emb.join(a1, "vec_id").join(broadcast(c1), "cell")
      .select(col("vec_id"), zip_with(col("e"), col("ce"), (x, y) => x - y).as("e"))
    val r1 = resid().queryExecution.logical.canonicalized
    val r2 = resid().queryExecution.logical.canonicalized
    println("PROBE resid canonical equal: " + (r1 == r2))
    if (r1 != r2) {
      val s1 = r1.treeString
      val s2 = r2.treeString
      println("PROBE tree strings equal: " + (s1 == s2))
      s1.linesIterator.zip(s2.linesIterator).zipWithIndex
        .filter { case ((a, b), _) => a != b }.take(4)
        .foreach { case ((a, b), i) =>
          println(s"PROBE LINE $i\nPROBE   A: $a\nPROBE   B: $b")
        }
    }
    spark.stop()
  }
}
