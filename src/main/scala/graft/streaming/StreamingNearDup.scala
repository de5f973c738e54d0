package graft.streaming

import graft.operators.DedupPack
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Live ingestion near-dup gate — the streaming member of the MinHash
  * family: each arriving document is checked against a STATIC band-
  * signature index of the standing corpus via a stream-static join.
  *
  * Architecture (the production shape at 100 TB):
  *  - the INDEX is built batch-side by the existing oracled pipeline
  *    ([[corpusIndex]] = DedupPack band signatures, 8 rows per standing
  *    doc) and stored as a parquet table; Spark re-plans the static side
  *    per micro-batch, so an index rebuild (nightly dedup job) is picked
  *    up without restarting the stream.
  *  - the STREAM side computes signatures STATELESSLY per row
  *    ([[bandKeys]]): non-time windows and multi-row aggregations are
  *    unsupported on streams, so the batch pipeline's explode →
  *    lead-window → groupBy(min) becomes per-row higher-order array
  *    functions (split → 3-gram transform → md5 base → 32 permuted
  *    array_min's). Same arithmetic, zero state.
  *  - multi-band hits for the same (incoming, standing) pair collapse
  *    through `dropDuplicatesWithinWatermark` — bounded state, one flag
  *    per pair (the unbounded-state dropDuplicates trap documented in
  *    [[StreamingDedup]]).
  *
  * StreamingSpec pins [[bandKeys]] EXACTLY equal to the batch
  * `bandSignatures(minhashFromShingles(shingles(docs)))` on the live
  * corpus, and the end-to-end flag-once/no-false-positive contract
  * across micro-batches. Reference: cleaner.py:109 deduplicate (batch
  * analog); etl/pipeline.py's ingest path for the live shape.
  */
object StreamingNearDup {

  private val P = DedupPack.MinhashP

  /** (a·x + b) mod P with the same overflow-free 2^28-split modmul as
    * DedupPack.minhashFromShingles — bit-identical signatures.
    */
  private def permHash(x: Column, a: Long, b: Long): Column = {
    val hi = shiftright(x, 28)
    val lo = x.bitwiseAND(lit((1L << 28) - 1))
    (((lit(a) * hi) % P) * lit(1L << 28) % P + (lit(a) * lo) % P + lit(b)) % P
  }

  /** Stateless per-row band-signature ARRAY (element b+1 = band b's
    * sig string); docs with < 3 tokens get an EMPTY array — they have no
    * 3-gram shingles, so they can collide with nothing and must pass a
    * near-dup gate vacuously. (They are kept, not filtered: filtering
    * here silently dropped sig-less docs from the ingest admission
    * pipeline, diverging from the batch gates, which only exclude them
    * from the band-hit side — the r13 ADVICE parity bug.) The un-exploded
    * form is what the ingest admission gate probes band-by-band
    * ([[StreamingCorpusIngest]]) — aggregation-free on a stream.
    */
  def bandSigArray(docs: DataFrame, out: String): DataFrame = {
    val arr = split(col("text"), " ")
    // CaseWhen evaluates per-row lazily, so the descending
    // sequence(0, n) for n < 0 in the short-doc case is never built
    val shingles = when(size(arr) >= 3,
      array_distinct(transform(sequence(lit(0), size(arr) - 3),
        i => concat_ws(" ",
          element_at(arr, i + 1), element_at(arr, i + 2), element_at(arr, i + 3)))))
      .otherwise(array().cast("array<string>"))
    val bases = transform(col("__sh"),
      s0 => conv(substring(md5(s0), 1, 14), 16, 10).cast("long"))
    val mhs: Seq[Column] = DedupPack.PermConsts.map { case (_, a, b) =>
      array_min(transform(col("__base"), x => permHash(x, a, b)))
    }
    val rows = NumRowsPerBand
    val sigs = (0 until DedupPack.NumBands).map { b =>
      concat_ws(",", mhs.slice(b * rows, b * rows + rows): _*)
    }
    docs
      .withColumn("__sh", shingles)
      .withColumn("__base", bases) // empty in, empty out for short docs
      .withColumn(out, when(size(col("__sh")) >= 1, array(sigs: _*))
        .otherwise(array().cast("array<string>")))
      .select((docs.columns.map(col) :+ col(out)): _*)
  }

  /** Stateless per-row band keys: (input columns..., band, sig) — 8 rows
    * per doc with >= 3 tokens (the exploded form the flag join uses).
    */
  def bandKeys(docs: DataFrame): DataFrame =
    bandSigArray(docs, "__sigs")
      .select((docs.columns.map(col) :+
        posexplode(col("__sigs")).as(Seq("band", "sig"))): _*)

  private val NumRowsPerBand = DedupPack.NumPerms / DedupPack.NumBands

  /** The static side: band signatures of the standing corpus from the
    * oracled batch pipeline, keyed for the stream join.
    */
  def corpusIndex(docs: DataFrame): DataFrame =
    DedupPack.bandSignatures(DedupPack.minhashSignatures(docs))
      .select(col("doc_id").as("match_doc"), col("band"), col("sig"))

  /** Flag incoming docs whose signature collides with the standing
    * corpus in any band: one (ts, doc_id, match_doc) row per pair,
    * multi-band hits deduped with watermark-bounded state.
    *
    * Shape (rebased r14, VERDICT r13 finding #1): the ADMIT-shape gate
    * first — signatures stay COLUMNS and each band is one stream-static
    * LEFT probe against the per-band DISTINCT signature set (at most one
    * match per probe, so no row multiplication; 8 joins, a constant).
    * Only the (rare) docs with ≥1 band hit are exploded and joined
    * against the full identity index to recover WHICH standing doc
    * matched. The r13 measurement had the old explode-everything join at
    * ~34 docs/s vs 460 docs/s for the ingest gate doing strictly more
    * work on the same corpus — the 8-row-per-doc explode put the whole
    * stream through the shuffle join; now only hits pay for identity.
    *
    * @param docs  streaming (ts: TimestampType, doc_id, text, ...)
    * @param index static (match_doc, band, sig) — [[corpusIndex]]
    */
  def flagged(docs: DataFrame, index: DataFrame, watermark: String): DataFrame = {
    val bIdx = index.select("band", "sig").distinct()
    val withSigs = bandSigArray(docs.select(col("ts"), col("doc_id"), col("text")), "__sigs")
    val probed = (0 until DedupPack.NumBands).foldLeft(withSigs) { (df, b) =>
      df.join(
        bIdx.filter(col("band") === b).select(col("sig").as(s"__hit$b")),
        element_at(col("__sigs"), b + 1) === col(s"__hit$b"), "left")
    }
    val hits = probed
      .filter((0 until DedupPack.NumBands).map(b => col(s"__hit$b").isNotNull)
        .reduce(_ || _))
    hits
      .select(col("ts"), col("doc_id"),
        posexplode(col("__sigs")).as(Seq("band", "sig")))
      .join(index, Seq("band", "sig")) // identity lookup: hits only
      .filter(col("doc_id") =!= col("match_doc"))
      .select(col("ts"), col("doc_id"), col("match_doc"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("doc_id", "match_doc"))
  }

  /** The pre-r14 explode-everything form: every doc's 8 band rows go
    * through the identity join. Keep ONLY for feeds where most docs are
    * expected to hit (e.g. replaying a known-duplicated backlog), where
    * the probe prefilter saves nothing; on organic feeds (hits rare) the
    * probe-shaped [[flagged]] is ~13x faster (streambench_r13_10x).
    */
  def flaggedEager(docs: DataFrame, index: DataFrame, watermark: String): DataFrame =
    bandKeys(docs)
      .join(index, Seq("band", "sig")) // stream-static inner join
      .filter(col("doc_id") =!= col("match_doc"))
      .select(col("ts"), col("doc_id"), col("match_doc"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("doc_id", "match_doc"))
}
