package graft.tools

import graft.GraftSession
import graft.sources.MockDataGen

/** Write a MockDataGen suite for the scale rehearsals (VERDICT r15
  * task 7 → task 1): replaces the gen_scale.py replica datasets with
  * directly-generated ones at arbitrary SF.
  *
  * `runMain graft.tools.GenSuite <sf> <dir> [seed]`
  *   sf 1.0  ≡ 1M events / 50k docs / 50k vectors (10× the bench sf0.1)
  *   sf 10.0 ≡ 10M events / 500k docs / 500k vectors (100× bench)
  *
  * `runMain graft.tools.GenSuite emb <n> <dir> [seed]` writes ONLY an
  * embeddings.parquet with n vectors (the ≥1M-vector beam-ANN runs don't
  * need the rest of the suite).
  */
object GenSuite {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("graft-gensuite")
    val t0 = System.nanoTime()
    args.toList match {
      case "emb" :: n :: dir :: rest =>
        MockDataGen.embeddings(spark, n.toLong,
          seed = rest.headOption.map(_.toLong).getOrElse(42L))
          .repartition(64)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      case sf :: dir :: rest =>
        MockDataGen.writeSuite(spark, dir, sf.toDouble,
          seed = rest.headOption.map(_.toLong).getOrElse(42L))
      case _ => sys.error("usage: GenSuite <sf> <dir> [seed] | GenSuite emb <n> <dir> [seed]")
    }
    println(f"""{"metric":"gensuite","args":"${args.mkString(" ")}","sec":${(System.nanoTime() - t0) / 1e9}%.1f}""")
    spark.stop()
  }
}
