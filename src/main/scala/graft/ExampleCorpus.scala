package graft

import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline example — the corpus-side companion
  * of [[Example]]: ingest → exact dedup → duplicated-span audit →
  * quality gate → blocklist gate → corpus-LM fit → curriculum deciles →
  * near-dup clusters → semantic diversity audit → cluster-balanced
  * sample → length planning → mix plans → leakage check → Zipf corpus
  * health → batch layout → retrieval chunks → chunk-store dedup → shard
  * layout → embedding compression → compressed ANN → lexical + hybrid
  * serving → graph-ANN beam search → graph-rank curation signal → tokenizer training → contrastive triplet mining. Every step is a registered, oracle-checked query; this main
  * just chains them the way a corpus job would.
  * `runMain graft.ExampleCorpus [sfDir]`.
  */
object ExampleCorpus {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get("graft-example-corpus")
    val q = SparkEntry.queries

    println("[1/27] Corpus...")
    val docs = Tables.documents(spark, d)
    println(s"  ${docs.count()} documents, ${docs.select("lang").distinct().count()} languages")

    println("[2/27] Exact dedup (md5 canonical text)...")
    val exact = q("q_dedup_exact_docs")(spark, d)
    println(s"  ${exact.count()} unique contents, " +
      s"${exact.agg(coalesce(sum(col("n_dups") - 1), lit(0L))).head.getLong(0)} exact dups dropped")

    println("[3/27] Duplicated-span audit (substring-level dedup)...")
    val dstats = q("q_dup_stats")(spark, d)
      .agg(coalesce(sum(col("dup_tokens")), lit(0L)).as("dup"),
        coalesce(sum(col("total_tokens")), lit(0L)).as("tot")).head()
    println(s"  ${dstats.getLong(0)} of ${dstats.getLong(1)} tokens inside duplicated runs")

    println("[4/27] Quality gate (length/punct/stopword composite)...")
    val qual = q("q_quality_score")(spark, d)
    println(s"  ${qual.filter(col("quality") >= 0.5).count()} docs at quality >= 0.5")

    println("[5/27] Blocklist gate (C4 bad-words filter)...")
    val bl = q("q_blocklist_filter")(spark, d)
    println(s"  ${bl.filter(col("keep_strict") === 1).count()} of ${bl.count()} docs " +
      "survive drop-on-any-hit; " +
      s"${bl.filter(col("keep_soft") === 1).count()} survive the <=2%-mass gate")

    println("[6/27] Corpus-LM fit (bigram conditional -ln p per doc)...")
    val lm = q("q_bigram_logprob")(spark, d)
    println(f"  mean doc score ${lm.agg(avg(col("avg_neg_logprob2"))).head.getDouble(0)}%.3f " +
      s"over ${lm.count()} docs (high = token-salad)")

    println("[7/27] Curriculum deciles (quality-ordered bins):")
    q("q_quality_deciles")(spark, d).show(3, truncate = false)

    println("[8/27] Near-duplicate clusters (n-gram jaccard -> connected components)...")
    val clusters = q("q_dedup_clusters")(spark, d)
    println(s"  ${clusters.count()} docs in non-trivial clusters")

    println("[9/27] Semantic diversity audit (sqrt-n k-means cells)...")
    q("q_semantic_clusters")(spark, d).show(5, truncate = false)

    println("[10/27] Cluster-balanced sample...")
    println(s"  ${q("q_sample_semantic")(spark, d).count()} sampled vectors")

    println("[11/27] Sequence-length planning (exact per-source quantiles):")
    q("q_length_quantiles")(spark, d).show(5, truncate = false)

    println("[12/27] Mix plans (uniform-target budget + temperature alpha=0.5):")
    q("q_corpus_mix")(spark, d).show(truncate = false)
    val temp = q("q_mix_temperature")(spark, d)
    println(s"  temperature mix upsamples ${temp.filter(col("sample_rate") > 1.0).count()} " +
      "rare sources past 1 epoch")

    println("[13/27] Cross-source leakage check (5-gram overlap matrix):")
    val overlap = q("q_source_overlap")(spark, d)
    println(s"  ${overlap.count()} source pairs share shingles; max jaccard " +
      f"${overlap.agg(max(col("jaccard"))).head.getDouble(0)}%.4f")

    println("[14/27] Corpus health (Zipf rank-frequency fit per source):")
    q("q_zipf_slope")(spark, d).show(3, truncate = false)

    println("[15/27] Batch layout: padding waste vs packing...")
    val waste = q("q_padding_waste")(spark, d).filter(col("ctx_len") === 512)
    println(f"  pad-to-512 wastes ${waste.agg(
        sum(col("padded_tokens")) / (sum(col("padded_tokens")) + sum(col("n_tokens"))))
      .head.getDouble(0) * 100}%.1f%% of the batch; packing wastes none:")
    val packed = q("q_pack_contexts")(spark, d)
    println(s"  ${packed.count()} docs packed, " +
      s"${packed.filter(col("split") === 1).count()} split across a context boundary")

    println("[16/27] Retrieval chunks (128-token, 32 overlap)...")
    val chunks = q("q_chunk_docs")(spark, d)
    println(s"  ${chunks.count()} chunks over ${chunks.select("doc_id").distinct().count()} docs")

    println("[17/27] Chunk-store dedup audit (RETRO 64-token chunks)...")
    val cdup = q("q_chunk_dedup")(spark, d)
      .agg(coalesce(sum(col("dup_chunks")), lit(0L)).as("dup"),
        coalesce(sum(col("n_chunks")), lit(0L)).as("tot")).head()
    println(s"  ${cdup.getLong(0)} of ${cdup.getLong(1)} chunk instances are " +
      "duplicates (each a wasted embedding)")

    println("[18/27] Shard layout (deterministic 64-way training shuffle):")
    val shards = q("q_shard_manifest")(spark, d)
    println(s"  ${shards.count()} shards, " +
      s"${shards.agg(max(col("n_docs")) - min(col("n_docs"))).head.getLong(0)} doc spread")

    println("[19/27] Embedding compression (int8 per-vector quantization)...")
    val quant = q("q_embed_quantize")(spark, d)
    println(s"  ${quant.count()} vectors quantized, " +
      s"${quant.filter(col("n_sat") > 1).count()} with >1 saturated code")

    println("[20/27] PQ ADC retrieval over the compressed corpus:")
    q("q_ann_pq_topk")(spark, d).show(5, truncate = false)

    println("[21/27] IVF-PQ (pruned scan over residual codes):")
    q("q_ann_ivfpq_topk")(spark, d).show(5, truncate = false)

    println("[22/27] Graph ANN (beam search over the kNN graph — the latency point):")
    q("q_ann_beam_topk")(spark, d).show(5, truncate = false)

    println("[23/27] Lexical serving (BM25 top-k) + kNN graph purity audit:")
    q("q_bm25_topk")(spark, d).show(3, truncate = false)
    val purity = q("q_knn_purity")(spark, d)
    println(f"  mean kNN label purity ${purity.agg(avg(col("purity"))).head.getDouble(0)}%.3f")

    println("[24/27] Graph-rank quality propagation (PageRank over the kNN graph):")
    q("q_graph_rank")(spark, d).show(5, truncate = false)

    println("[25/27] Hybrid retrieval (BM25 + cosine, reciprocal-rank fusion):")
    q("q_rrf_hybrid")(spark, d).show(5, truncate = false)

    println("[26/27] Tokenizer training (BPE merge candidates + 8 trained merges):")
    q("q_bpe_pair_freqs")(spark, d).show(3, truncate = false)
    val vocab = docs.select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
    val (merges, _) = graft.operators.Bpe.train(vocab, 8)
    println(s"  merges: ${merges.map { case (a, b) => s"$a+$b" }.mkString(", ")}")

    println("[27/27] Contrastive triplets for embedding-model training:")
    q("q_triplet_mining")(spark, d).show(7, truncate = false)

    spark.stop()
  }
}
