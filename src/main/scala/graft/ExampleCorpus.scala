package graft

import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline example — the corpus-side companion
  * of [[Example]]: ingest → exact dedup → duplicated-span audit →
  * quality gate → near-dup clusters → semantic diversity audit →
  * cluster-balanced sample → length planning → mix plan → context
  * packing → shard layout → embedding compression. Every step is a
  * registered, oracle-checked query; this main just chains them the way
  * a corpus job would. `runMain graft.ExampleCorpus [sfDir]`.
  */
object ExampleCorpus {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get("graft-example-corpus")
    val q = SparkEntry.queries

    println("[1/13] Corpus...")
    val docs = Tables.documents(spark, d)
    println(s"  ${docs.count()} documents, ${docs.select("lang").distinct().count()} languages")

    println("[2/13] Exact dedup (md5 canonical text)...")
    val exact = q("q_dedup_exact_docs")(spark, d)
    println(s"  ${exact.count()} unique contents, " +
      s"${exact.agg(coalesce(sum(col("n_dups") - 1), lit(0L))).head.getLong(0)} exact dups dropped")

    println("[3/13] Duplicated-span audit (substring-level dedup)...")
    val dstats = q("q_dup_stats")(spark, d)
      .agg(coalesce(sum(col("dup_tokens")), lit(0L)).as("dup"),
        coalesce(sum(col("total_tokens")), lit(0L)).as("tot")).head()
    println(s"  ${dstats.getLong(0)} of ${dstats.getLong(1)} tokens inside duplicated runs")

    println("[4/13] Quality gate (length/punct/stopword composite)...")
    val qual = q("q_quality_score")(spark, d)
    println(s"  ${qual.filter(col("quality") >= 0.5).count()} docs at quality >= 0.5")

    println("[5/13] Near-duplicate clusters (n-gram jaccard -> connected components)...")
    val clusters = q("q_dedup_clusters")(spark, d)
    println(s"  ${clusters.count()} docs in non-trivial clusters")

    println("[6/13] Semantic diversity audit (sqrt-n k-means cells)...")
    q("q_semantic_clusters")(spark, d).show(5, truncate = false)

    println("[7/13] Cluster-balanced sample...")
    println(s"  ${q("q_sample_semantic")(spark, d).count()} sampled vectors")

    println("[8/13] Sequence-length planning (exact per-source quantiles):")
    q("q_length_quantiles")(spark, d).show(5, truncate = false)

    println("[9/13] Mix plans (uniform-target budget + temperature alpha=0.5):")
    q("q_corpus_mix")(spark, d).show(truncate = false)
    val temp = q("q_mix_temperature")(spark, d)
    println(s"  temperature mix upsamples ${temp.filter(col("sample_rate") > 1.0).count()} " +
      "rare sources past 1 epoch")

    println("[10/13] Context packing (512-token training layout)...")
    val packed = q("q_pack_contexts")(spark, d)
    println(s"  ${packed.count()} docs packed, " +
      s"${packed.filter(col("split") === 1).count()} split across a context boundary")

    println("[11/13] Shard layout (deterministic 64-way training shuffle):")
    val shards = q("q_shard_manifest")(spark, d)
    println(s"  ${shards.count()} shards, " +
      s"${shards.agg(max(col("n_docs")) - min(col("n_docs"))).head.getLong(0)} doc spread")

    println("[12/13] Embedding compression (int8 per-vector quantization)...")
    val quant = q("q_embed_quantize")(spark, d)
    println(s"  ${quant.count()} vectors quantized, " +
      s"${quant.filter(col("n_sat") > 1).count()} with >1 saturated code")

    println("[13/13] PQ ADC retrieval over the compressed corpus:")
    q("q_ann_pq_topk")(spark, d).show(5, truncate = false)

    spark.stop()
  }
}
