package graft.tools

import graft.GraftSession
import graft.operators.Ann
import org.apache.spark.sql.functions._

/** Scaled recall + latency evidence for the graph-ANN beam search
  * (VERDICT r11 task 4): runs `Ann.graphBeamTopK` over the 10x replica
  * embeddings (gen_scale.py, 20k vectors) at several (beam, hops)
  * settings, measuring recall@10 vs `Ann.bruteTopK` ground truth and
  * wall seconds per setting — the beam family's analog of the IVF
  * recall-curve tables in BASELINE.md round-10.
  *
  * `runMain graft.tools.BeamScale [scaleDir] [nQueries]` — prints one
  * JSON line per setting plus a summary line.
  */
object BeamScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfscale10")
    val nQueries = args.lift(1).flatMap(_.toIntOption).getOrElse(100)
    val k = 10
    val spark = GraftSession.get("graft-beamscale")

    val emb = Ann.withNorm(
      spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e")))
      .cache()
    val n = emb.count()

    // the shared LSH candidate pool, auto-sized exactly as AnnPack does.
    // BEAM_CAP (default 2000 = the query-suite default) bounds each
    // band bucket: at 300k vectors the keep-all pool with cap 2000
    // exceeded local spill disk (measured r14: SPILL_OUT_OF_MEMORY, no
    // space left) — an 8-degree graph needs nowhere near 2000 scored
    // partners per bucket, so the scale runs turn the cap down (the
    // exact lever the r13 pair-stream adjudication named).
    val cap = sys.env.get("BEAM_CAP").flatMap(_.toIntOption).getOrElse(2000)
    // BEAM_BITS/BEAM_BANDS override the auto sizing: at >=1M vectors the
    // auto band count (36 at 1.25M) exists for near-dup RECALL, but an
    // 8-degree graph needs only enough same-bucket partners per vector —
    // fewer bands keep the pool-pair stream (the r14 spill surface)
    // proportional to what the edge build actually consumes.
    val (autoBits, autoBands) = Ann.autoLshParams(n)
    val bits = sys.env.get("BEAM_BITS").flatMap(_.toIntOption).getOrElse(autoBits)
    val bands = sys.env.get("BEAM_BANDS").flatMap(_.toIntOption).getOrElse(autoBands)
    val t0 = System.nanoTime()
    val (pool, scaffolding) = Ann.hyperplaneNearDupStaged(
      emb, bands = bands, bits = bits, threshold = -2.0, cap = cap)
    val poolC = pool.cache()
    val nPairs = poolC.count()
    scaffolding.foreach(_.unpersist(blocking = false))
    val poolSec = (System.nanoTime() - t0) / 1e9
    println(f"""{"n_vectors":$n,"bits":$bits,"bands":$bands,"pool_pairs":$nPairs,"pool_build_sec":$poolSec%.2f}""")

    val brute = Ann.bruteTopK(emb, nQueries, k).select("q_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    // one edge build shared by the whole sweep (degree fixed)
    val tE = System.nanoTime()
    val edges = Ann.knnGraphEdges(poolC, degree = 8)
    println(f"""{"edge_rows":${edges.count()},"edge_build_sec":${(System.nanoTime() - tE) / 1e9}%.2f}""")
    poolC.unpersist(blocking = false)

    val cells = Ann.defaultCells(n)
    val settings = sys.env.get("BEAM_SETTINGS") match {
      case Some(s) => s.split(";").toSeq.map { p =>
        val Array(b, h) = p.split(","); (b.toInt, h.toInt)
      }
      case None => Seq((8, 2), (16, 3), (32, 4))
    }
    val seedModes =
      if (sys.env.contains("BEAM_SEEDED_ONLY")) Seq(true) else Seq(false, true)
    for {
      seeded <- seedModes
      (beam, hops) <- settings
    } {
      val t1 = System.nanoTime()
      val res = Ann.graphBeamTopKFromEdges(emb, edges, nQueries = nQueries,
        k = k, beam = beam, hops = hops,
        entryCells = if (seeded) cells else 0)
      val got = res.select("q_id", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t1) / 1e9
      val recall = brute.count(got.contains).toDouble / brute.length
      println(f"""{"quant":"f64","seeded":$seeded,"beam":$beam,"hops":$hops,"recall_at_$k":$recall%.4f,"search_sec":$sec%.2f,"queries":$nQueries}""")
    }

    // int8 serving path (VERDICT r13 task 8): the SAME graph + walk, but
    // every cosine is scored against the q_embed_quantize reconstruction
    // (codes * scale — the 4x-compressed vectors a serving tier would
    // hold); recall is still judged against the float-exact brute-force
    // ground truth, so the printed delta IS the quantization cost.
    val embQ = Ann.withNorm(
      emb.select(col("vec_id"),
          (array_max(transform(col("e"), v => abs(v))) / 127).as("scale"),
          col("e"))
        .select(col("vec_id"),
          when(col("scale") > 0,
            transform(col("e"), v => floor(v / col("scale") + lit(0.5)) * col("scale")))
            .otherwise(col("e")).as("e")))
      .cache()
    embQ.count()
    for ((beam, hops) <- settings.drop(1)) {
      val t1 = System.nanoTime()
      val res = Ann.graphBeamTopKFromEdges(embQ, edges, nQueries = nQueries,
        k = k, beam = beam, hops = hops, entryCells = cells)
      val got = res.select("q_id", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t1) / 1e9
      val recall = brute.count(got.contains).toDouble / brute.length
      println(f"""{"quant":"int8","seeded":true,"beam":$beam,"hops":$hops,"recall_at_$k":$recall%.4f,"search_sec":$sec%.2f,"queries":$nQueries}""")
    }
    embQ.unpersist(blocking = false)
    edges.unpersist(blocking = false)
    spark.stop()
  }
}
