package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Span-level corpus operators for training-data prep:
  *
  *  - `q_dup_spans` — exact duplicated-SPAN detection (the substring-level
  *    dedup of Lee et al. 2022, "Deduplicating Training Data Makes
  *    Language Models Better", arXiv:2107.06499): find the maximal token
  *    runs of each document that also appear verbatim in some other
  *    document, via the positional 3-gram index. Doc-level dedup
  *    (q_dedup_exact_docs / minhash / simhash) misses partial copies —
  *    boilerplate headers, quoted paragraphs, licence blocks — which at
  *    web scale are the bulk of duplicated text mass. Output spans are
  *    what a span-removal pass would cut.
  *
  *  - `q_pack_contexts` — context-window packing (the concatenate-and-
  *    split batch layout every LLM trainer runs before tokenized
  *    examples hit the GPU): deterministically order the corpus,
  *    concatenate, split at a fixed context length, and report for each
  *    document which context windows it lands in and whether a context
  *    boundary splits it. The cumulative token offset is computed as a
  *    two-level distributed prefix sum (16^p md5-prefix buckets with p
  *    sized from the corpus count, local cumsum per bucket + broadcast
  *    bucket offsets), NOT a single whole-source window — the oracle's
  *    sequential single-window scan verifying it hash-exact is precisely
  *    the proof the parallel decomposition is correct.
  *
  * Both are exact-integer end to end (positions, token counts, integer
  * division) — no float tolerance anywhere.
  */
object SpanPack extends QueryPack {

  /** Context length (tokens) for q_pack_contexts. */
  val ContextLen = 512

  /** Maximal duplicated token spans per document.
    *
    * A 3-gram occurrence at position p covers tokens [p, p+2]; a 3-gram
    * is "duplicated" when it occurs in >= 2 distinct documents (every
    * occurrence is then shared text, including the ones inside each
    * single doc). Contiguously-covered positions merge into one maximal
    * span via gaps-and-islands: a new span starts where the running max
    * of previous span-ends leaves a gap.
    *
    * Scale shape: one hash aggregate over the shingle stream (min/max
    * doc per shingle — linear, shuffle on shingle), one join
    * back (output bounded by the position stream: each position carries
    * exactly one shingle, so no candidate blow-up however common a
    * shingle is — unlike pair generation, coverage is linear BY
    * CONSTRUCTION and needs no posting cap), then per-doc windows.
    * Rides the session-memoized positional shingle scan shared with
    * jaccard/MinHash/winnowing.
    */
  def dupSpans(s: SparkSession, d: String): DataFrame =
    spansCached(s, d).orderBy("doc_id", "span_start")

  /** Session-memoized span table (unordered) — q_dup_spans and
    * q_dup_stats both consume it, so a session running both (Verify,
    * Bench) builds the coverage join and merge windows once.
    */
  private val spanCache =
    graft.Memo.map[(SparkSession, String), DataFrame](graft.Memo.release)

  def spansCached(s: SparkSession, d: String): DataFrame =
    spanCache.getOrElseUpdate((s, d),
      dupSpansFrom(TextPack.posShinglesCached(s, d)
        .filter(col("shingle").isNotNull)
        .select("doc_id", "pos", "shingle")).cache())

  /** Kernel over an explicit (doc_id, pos, shingle) stream. */
  def dupSpansFrom(pos3: DataFrame): DataFrame = {
    // "occurs in >= 2 distinct docs" == min(doc_id) != max(doc_id):
    // a plain single-phase hash aggregate, no distinct expansion
    val dup = pos3.groupBy("shingle")
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select("shingle")
    val cov = pos3.join(dup, "shingle").select("doc_id", "pos")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    // three dependent layers over ONE (doc_id, pos) sort: running max of
    // prior span-ends -> gap flag -> running span counter
    cov
      .withColumn("prev_end",
        max(col("pos") + 2).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("span_id",
        sum(when(col("prev_end").isNull || col("pos") > col("prev_end") + 1, 1)
          .otherwise(0)).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "span_id")
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + 2).cast("long").as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_len"))
  }

  /** Context-window packing layout.
    *
    * Global order within each source = (md5(text), doc_id) — a
    * deterministic corpus shuffle (hash order decorrelates adjacent
    * documents, the same reason training pipelines shuffle before
    * packing) that is reproducible across runs, partitionings, and
    * engines. Token offsets come from a two-level prefix sum:
    * cumsum within (source, md5-first-2-hex bucket), bucket totals
    * aggregated ON TOP of the windowed frame (ReuseExchange: the
    * aggregate reuses the window's (source, bucket) shuffle instead of
    * rescanning), dimension-sized bucket-offset cumsum, broadcast join
    * back. No window ever sees a whole source in one task — at 100 TB a
    * single-window cumsum over one source would serialize the entire
    * corpus through one executor; the 256-way decomposition is the
    * standard parallel prefix-sum and the oracle proves it equals the
    * sequential scan bit-for-bit.
    */
  def packContexts(s: SparkSession, d: String): DataFrame = {
    val docs = packDocsCached(s, d)
    packLayout(docs, packPrefixLen(docs.count()))
  }

  /** Kernel over an explicit documents frame (source, doc_id, text).
    * `prefixLen` picks the bucket fan-out; the layout is INVARIANT to it
    * (the bucket is a prefix of the order key), so callers can size it
    * freely — see [[packPrefixLen]].
    */
  def packContextsFrom(documents: DataFrame, prefixLen: Int = 2): DataFrame =
    packLayout(narrowDocs(documents), prefixLen)

  /** Bucket-prefix length (md5 hex chars → 16^p buckets) for the
    * two-level prefix sum, sized from the corpus count like
    * Ann.autoLshParams: minimal p in [2, 6] keeping the average bucket
    * under ~1M docs, so no local-cumsum task sorts more than that and
    * the bucket-offset table stays broadcast-sized (16^6 = 16.7M rows
    * only past ~10^13 docs). The packed layout itself is invariant to p
    * — the spec pins a cross-p equality — so the sizing needs no oracle
    * mirror, unlike the recall-bearing LSH width.
    */
  def packPrefixLen(n: Long): Int =
    (2 to 6).find(p => n <= (1L << (4 * p)) * 1000000L).getOrElse(6)

  /** The narrow pack projection: one pass over `text` produces
    * (source, doc_id, n_tokens, h) — everything downstream needs, at
    * ~0.1% of the corpus width.
    */
  private def narrowDocs(documents: DataFrame): DataFrame =
    documents.select(
      col("source"), col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      md5(col("text")).as("h"))

  /** Session-memoized narrow projection — the layout references it
    * twice (per-bucket cumsum + bucket totals), and without
    * materialization the pruned aggregate side defeats ReuseExchange
    * and re-scans `text` (verified in the plan audit). Caching the
    * narrow frame makes the heavy column a single-read at any scale.
    */
  private val packDocsCache =
    graft.Memo.map[(SparkSession, String), DataFrame](graft.Memo.release)

  def packDocsCached(s: SparkSession, d: String): DataFrame =
    packDocsCache.getOrElseUpdate((s, d),
      narrowDocs(Tables.documents(s, d)).cache())

  private def packLayout(docsNarrow: DataFrame, prefixLen: Int): DataFrame = {
    val C = ContextLen
    val docs = docsNarrow.withColumn("bucket", substring(col("h"), 1, prefixLen))
    val wLocal = Window.partitionBy("source", "bucket").orderBy("h", "doc_id")
    val local = docs.withColumn("local_end",
      sum(col("n_tokens")).over(wLocal.rowsBetween(Window.unboundedPreceding, 0)))
    // bucket totals from the windowed frame -> same Exchange subtree as
    // the window side of the join below -> shuffle written once
    val bucketTot = local.groupBy("source", "bucket")
      .agg(sum(col("n_tokens")).as("btot"))
    val wB = Window.partitionBy("source").orderBy("bucket")
    val offs = bucketTot
      .withColumn("boff",
        coalesce(sum(col("btot")).over(wB.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("source", "bucket", "boff")
    local.join(broadcast(offs), Seq("source", "bucket"))
      .withColumn("end_off", col("boff") + col("local_end"))
      .withColumn("start_off", col("end_off") - col("n_tokens"))
      .withColumn("first_ctx", expr(s"start_off div $C"))
      .withColumn("last_ctx", expr(s"(end_off - 1) div $C"))
      .select(col("source"), col("doc_id"), col("n_tokens"), col("start_off"),
        col("first_ctx"), col("last_ctx"),
        (col("last_ctx") - col("first_ctx") + 1).as("n_ctx"),
        (col("last_ctx") > col("first_ctx")).cast("int").as("split"))
      .orderBy("source", "start_off")
  }

  /** Corpus-level duplication report: per source, how much token mass
    * sits inside duplicated spans (the headline number of every dedup
    * paper — what a span-removal pass would delete), plus how many docs
    * carry any duplicated run. Ratios are single IEEE divisions of
    * exact integer sums. Left join: a source whose docs share nothing
    * still reports zeros.
    */
  def dupStats(s: SparkSession, d: String): DataFrame = {
    val perDoc = spansCached(s, d).groupBy("doc_id")
      .agg(sum(col("span_len")).as("doc_dup_tokens"))
    val docs = Tables.documents(s, d).select(
      col("source"), col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    docs.join(perDoc, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("doc_dup_tokens").isNotNull).cast("long")).as("n_dup_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(coalesce(col("doc_dup_tokens"), lit(0L))).as("dup_tokens"))
      .select(col("source"), col("n_docs"), col("n_dup_docs"),
        col("total_tokens"), col("dup_tokens"),
        (col("dup_tokens") / col("total_tokens")).as("dup_ratio"),
        (col("n_dup_docs") / col("n_docs")).as("dup_doc_share"))
      .orderBy("source")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dup_spans" -> ((s, d) => dupSpans(s, d)),
    "q_dup_stats" -> ((s, d) => dupStats(s, d)),
    "q_pack_contexts" -> ((s, d) => packContexts(s, d)))

  /** Shared dup-span CTE chain (final CTE: sp = covered positions with
    * span ids). generate_subscripts is 1-based; Spark's posexplode is
    * 0-based, so the mirror shifts pos by -1 to emit identical offsets.
    */
  private val DupSpanCte: String =
    """toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
      |         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
      |  FROM documents
      |),
      |sh AS (
      |  SELECT doc_id, pos,
      |         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
      |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      |),
      |p3 AS (SELECT doc_id, pos, shingle FROM sh WHERE shingle IS NOT NULL),
      |dup AS (SELECT shingle FROM p3 GROUP BY shingle HAVING min(doc_id) <> max(doc_id)),
      |cov AS (SELECT doc_id, pos FROM p3 JOIN dup USING (shingle)),
      |isl AS (
      |  SELECT doc_id, pos,
      |         max(pos + 2) OVER (PARTITION BY doc_id ORDER BY pos
      |                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      |  FROM cov
      |),
      |sp AS (
      |  SELECT doc_id, pos,
      |         sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
      |  FROM isl
      |)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_dup_spans" ->
      s"""WITH $DupSpanCte
         |SELECT doc_id,
         |       CAST(min(pos) AS BIGINT) AS span_start,
         |       CAST(max(pos) + 2 AS BIGINT) AS span_end,
         |       CAST(max(pos) + 2 - min(pos) + 1 AS BIGINT) AS span_len
         |FROM sp GROUP BY doc_id, span_id ORDER BY doc_id, span_start""".stripMargin,
    "q_dup_stats" ->
      s"""WITH $DupSpanCte,
         |spans AS (
         |  SELECT doc_id, max(pos) + 2 - min(pos) + 1 AS span_len
         |  FROM sp GROUP BY doc_id, span_id
         |),
         |perdoc AS (SELECT doc_id, sum(span_len) AS doc_dup_tokens FROM spans GROUP BY doc_id),
         |dt AS (
         |  SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents
         |)
         |SELECT source,
         |       count(*) AS n_docs,
         |       CAST(sum(CASE WHEN p.doc_dup_tokens IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |       CAST(sum(coalesce(p.doc_dup_tokens, 0)) AS BIGINT) AS dup_tokens,
         |       CAST(sum(coalesce(p.doc_dup_tokens, 0)) AS BIGINT)
         |         / CAST(sum(n_tokens) AS BIGINT) AS dup_ratio,
         |       CAST(sum(CASE WHEN p.doc_dup_tokens IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |         / count(*) AS dup_doc_share
         |FROM dt LEFT JOIN perdoc p USING (doc_id)
         |GROUP BY source ORDER BY source""".stripMargin,
    // the oracle computes the offsets as ONE sequential window per
    // source — hash equality against it proves the engine's two-level
    // parallel prefix sum exact
    "q_pack_contexts" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         md5(text) AS h
        |  FROM documents
        |),
        |c AS (
        |  SELECT source, doc_id, n_tokens,
        |         sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id) AS end_off
        |  FROM t
        |)
        |SELECT source, doc_id, n_tokens,
        |       CAST(end_off - n_tokens AS BIGINT) AS start_off,
        |       CAST((end_off - n_tokens) // 512 AS BIGINT) AS first_ctx,
        |       CAST((end_off - 1) // 512 AS BIGINT) AS last_ctx,
        |       CAST((end_off - 1) // 512 - (end_off - n_tokens) // 512 + 1 AS BIGINT) AS n_ctx,
        |       CAST((end_off - 1) // 512 > (end_off - n_tokens) // 512 AS INT) AS split
        |FROM c ORDER BY source, start_off""".stripMargin)
}
