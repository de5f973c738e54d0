package graft.streaming

import graft.operators.DedupPack
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Live corpus ADMISSION — the streaming analogue of the composed batch
  * build (sources/CorpusJob.scala): each arriving document passes the
  * same three gates the batch clean applies, against the standing
  * corpus, and leaves with its shard assignment:
  *
  *   quality  — the q_corpus_filter predicate, stateless per row
  *              (length floor + composite score ≥ 0.7);
  *   exact    — md5(text) must match neither the standing corpus's
  *              content index (stream-static LEFT ANTI join; the static
  *              side is re-planned per micro-batch, so a nightly index
  *              rebuild is picked up live) nor an earlier in-flight doc
  *              (dropDuplicatesWithinWatermark — watermark-bounded
  *              state, the [[StreamingDedup]] discipline);
  *   near-dup — none of the doc's MinHash band signatures may collide
  *              with the standing band index. Aggregating "all 8 bands
  *              clean" on a stream would need stateful grouping, so the
  *              signatures stay COLUMNS (the [[StreamingNearDup]]
  *              stateless per-row arithmetic, un-exploded) and the gate
  *              is 8 chained stream-static LEFT joins against the
  *              per-band distinct-signature sets, admitted = all 8
  *              probes null. Join count is the band count (a constant),
  *              not data-dependent.
  *
  * Admitted rows carry `shard` = the manifest's portable
  * md5-first-14-hex integer mod NShards, so a foreachBatch sink can
  * append straight into the ShardWriter layout the batch job produces.
  *
  * StreamingIngestSpec pins the admitted SET equal to the equivalent
  * batch gates run on the same input (exact parity, not statistical),
  * plus the within-stream redelivery contract across micro-batches.
  * Reference: etl/pipeline.py fetch→clean→store as a live loop;
  * cleaner.py:109 deduplicate.
  */
object StreamingCorpusIngest {

  /** q_corpus_filter's admission predicate, per-row stateless form. */
  def qualityOk(text: Column): Column = {
    val toks = split(text, " ")
    val nChars = length(text).cast("double")
    val nTokens = size(toks).cast("double")
    val nDistinct = size(array_distinct(toks)).cast("double")
    val nStop = size(filter(toks, t => t === "the" || t === "a")).cast("double")
    val score = least(nChars / 500.0, lit(1.0)) * 0.4 +
      (nDistinct / nTokens) * 0.3 + (lit(1.0) - nStop / nTokens) * 0.3
    length(text) >= 150 && score >= 0.7
  }

  /** Static exact-dup index: the standing corpus's distinct content
    * hashes (one slim column — the 100 TB-side index is hash-sized,
    * not text-sized).
    */
  def contentIndex(docs: DataFrame): DataFrame =
    docs.select(md5(col("text")).as("cmd5")).distinct()

  /** Static near-dup index: per-band DISTINCT signature sets of the
    * standing corpus (the [[StreamingNearDup.corpusIndex]] frame with
    * doc identity dropped — admission needs "does any standing doc
    * collide", not which).
    */
  def bandIndex(docs: DataFrame): DataFrame =
    StreamingNearDup.corpusIndex(docs).select("band", "sig").distinct()

  /** Admission pipeline over a streaming (ts: TimestampType, doc_id,
    * text, ...) frame. Emits admitted rows + shard in append mode.
    */
  def admit(docs: DataFrame, cIndex: DataFrame, bIndex: DataFrame,
            watermark: String): DataFrame = {
    val gated = docs
      .filter(qualityOk(col("text")))
      .withColumn("cmd5", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("cmd5"))
      .join(cIndex, Seq("cmd5"), "left_anti")
    // stateless per-row band signatures as an ARRAY column (index b+1 =
    // band b), then one left probe per band against its distinct sigs
    val withSigs = StreamingNearDup.bandSigArray(gated, "__sigs")
    val probed = (0 until DedupPack.NumBands).foldLeft(withSigs) { (df, b) =>
      df.join(
        bIndex.filter(col("band") === b).select(col("sig").as(s"__hit$b")),
        element_at(col("__sigs"), b + 1) === col(s"__hit$b"), "left")
    }
    probed
      .filter((0 until DedupPack.NumBands).map(b => col(s"__hit$b").isNull)
        .reduce(_ && _))
      .withColumn("shard",
        conv(substring(md5(col("doc_id").cast("string")), 1, 14), 16, 10)
          .cast("long") % graft.operators.CorpusPack.NShards)
      .select((docs.columns.map(col) :+ col("cmd5") :+ col("shard")): _*)
  }

  /** The same three gates in BATCH form on the same inputs — the parity
    * reference the spec pins the stream against (and a usable one-shot
    * backfill admission for a static increment).
    */
  def admitBatch(docs: DataFrame, standing: DataFrame): DataFrame = {
    val cIdx = contentIndex(standing)
    val bIdx = bandIndex(standing)
    val q = docs.filter(qualityOk(col("text")))
      .withColumn("cmd5", md5(col("text")))
      // within-batch exact dedup: first doc_id per content wins
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("cmd5").orderBy("doc_id")))
      .filter(col("__rk") === 1).drop("__rk")
      .join(cIdx, Seq("cmd5"), "left_anti")
    val hits = StreamingNearDup.bandKeys(q.drop("cmd5"))
      .join(bIdx, Seq("band", "sig"), "left_semi")
      .select("doc_id").distinct()
    q.join(hits, Seq("doc_id"), "left_anti")
      .withColumn("shard",
        conv(substring(md5(col("doc_id").cast("string")), 1, 14), 16, 10)
          .cast("long") % graft.operators.CorpusPack.NShards)
      .select((docs.columns.map(col) :+ col("cmd5") :+ col("shard")): _*)
  }
}
