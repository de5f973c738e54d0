package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed deterministic mock-data generator (VERDICT r15 task 7).
  *
  * Engine-parity counterpart of the reference's single-process mock
  * generator (reference `tools/generate_mock_ticks.py`:1-201: seeded
  * numpy random-walk ticks written per symbol). Re-expressed Spark-first:
  * `spark.range(n)` fans the id space across executors and every field is
  * a pure hash of (seed, id[, position]) built from native expressions
  * (xxhash64 → uniform), so generation is:
  *
  *   - distributed — no driver loop, no replica concatenation (replaces
  *     tools/gen_scale.py's K-copy rehearsal datasets);
  *   - deterministic — same (seed, n) → bit-identical table, any cluster
  *     size, any partitioning;
  *   - content-addressed — row i's content depends ONLY on (seed, i),
  *     never on n, so a larger SF is a strict superset of a smaller one
  *     (sf-prefix stability: oracles pinned at a small SF stay valid as
  *     the same rows at a bigger one).
  *
  * Tables mirror the driver testdata schemas (TESTDATA.md): events,
  * documents (with planted exact-dup and near-dup structure at known
  * rates, so dedup rehearsals have ground truth), embeddings (loose
  * label clusters + planted cosine≈1 pairs, the regime IVF/beam ANN
  * exists for), plus the reference's random-walk tick feed.
  */
object MockDataGen {

  /** uniform [0,1) from a 64-bit hash of the given columns: top 53 bits
    * over 2^53 (the exact-double mantissa range).
    */
  private def u(cols: Column*): Column =
    shiftrightunsigned(xxhash64(cols: _*), 11) / lit(9007199254740992.0)

  private def pick(arr: Seq[String], x: Column): Column = {
    // element_at is 1-based; x in [0,1)
    element_at(array(arr.map(lit): _*), (x * arr.size).cast("int") + 1)
  }

  // ---------------------------------------------------------------- events

  /** Event stream matching the driver's events.parquet shape:
    * event_id, ts (TIMESTAMP, 30-day window from 2024-01-01), user_id
    * (~1.5% of n distinct, the driver's density), event_type (5 types,
    * near-uniform), value (exp-tailed, mean ≈ 50, 2-decimal), props
    * (small JSON). ts/user/value are independent hashes of event_id —
    * the driver's stream is likewise unordered in event_id.
    */
  def events(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val users = math.max(1L, math.round(n * 0.015))
    val s = lit(seed)
    val id = col("id")
    val windowUs = 30L * 86400L * 1000000L
    spark.range(n).select(
      id.as("event_id"),
      // TIMESTAMP_NTZ like the driver's events.parquet (session tz is
      // pinned UTC, so the NTZ wall-clock equals the UTC instant)
      timestamp_micros(lit(1704067200000000L) +
        (u(s, id, lit("ts")) * windowUs).cast("long"))
        .cast("timestamp_ntz").as("ts"),
      (xxhash64(s, id, lit("user")) % users + users).cast("long") % users
        as "user_id",
      pick(Seq("signup", "view", "click", "purchase", "error"),
        u(s, id, lit("type"))).as("event_type"),
      round(greatest(-log(lit(1.0) - u(s, id, lit("value"))) * 50.0,
        lit(0.01)), 2).as("value"),
      concat(lit("{\"k\": "),
        (u(s, id, lit("props")) * 100).cast("int").cast("string"),
        lit("}")).as("props"))
  }

  // ------------------------------------------------------------- documents

  private val Vocab: Seq[String] = Seq(
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "window", "spark", "order", "data", "column",
    "join", "small", "line", "customer", "query", "a", "the", "filter",
    "group", "sort", "index", "page", "block", "cache", "read", "write",
    "plan", "cost", "stat", "null", "type", "string", "int", "float",
    "date", "time", "zone", "shard", "split", "skew", "salt", "probe",
    "build", "spill", "disk", "wide", "deep", "tree", "leaf", "root",
    "node", "edge", "graph", "rank", "score", "top", "limit")

  /** Exact-dup / near-dup plant rates (documents): fractions of rows
    * whose text is copied (exactly / with an appended suffix) from an
    * earlier row. Ground truth for dedup rehearsals: an expected ~3% of
    * docs are byte-identical to their canonical and ~5% more share an
    * (1 - ~8/len) token prefix (Jaccard well above typical 0.7 gates).
    */
  val ExactDupRate = 0.03
  val NearDupRate = 0.05
  private val DupWindow = 1000L

  /** Documents matching the driver's documents.parquet shape: doc_id,
    * text (10-99 space-separated Zipf-ish vocab tokens), lang (en-heavy
    * 5-language mix), source (src0..src19), n_chars. Dup structure is
    * content-addressed: a dup row's text derives from its CANONICAL id
    * (an earlier row within [[DupWindow]]), so the pair (i, canonical(i))
    * exists at every SF that contains both rows.
    */
  def documents(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val s = lit(seed)
    val id = col("id")
    // canonical id: dup rows point back 1..DupWindow rows (clamped ≥ 0)
    val back = (u(s, id, lit("dupsrc")) * DupWindow).cast("long") + 1L
    val dupRoll = u(s, id, lit("dup"))
    val isExact = dupRoll < ExactDupRate && id >= 1L
    val isNear = !isExact && dupRoll < (ExactDupRate + NearDupRate) && id >= 1L
    val canonical = when(isExact || isNear, greatest(id - back, lit(0L)))
      .otherwise(id)
    // base text: len tokens of canonical's stream; token k = Zipf-ish
    // vocab pick (u² squashes toward the head — a heavy head like real
    // term frequency, enough mass in the tail for per-doc novelty)
    def text(cid: Column, tag: String): Column = {
      val len = (u(s, cid, lit(s"len$tag")) * 90).cast("int") + 10
      concat_ws(" ", transform(sequence(lit(1), len),
        k => element_at(array(Vocab.map(lit): _*),
          (pow(u(s, cid, lit(s"tok$tag"), k), 2.0) * Vocab.size).cast("int") + 1)))
    }
    val baseText = text(canonical, "")
    // near-dup: canonical text + 3..8 fresh tokens of its OWN stream
    val suffix = concat_ws(" ", transform(
      sequence(lit(1), (u(s, id, lit("sfxlen")) * 6).cast("int") + 3),
      k => element_at(array(Vocab.map(lit): _*),
        (pow(u(s, id, lit("sfx"), k), 2.0) * Vocab.size).cast("int") + 1)))
    val textCol = when(isNear, concat(baseText, lit(" "), suffix))
      .otherwise(baseText)
    spark.range(n).select(
      id.as("doc_id"),
      textCol.as("text"),
      pick(Seq("en", "en", "en", "en", "de", "es", "fr", "zh"),
        u(s, id, lit("lang"))).as("lang"),
      concat(lit("src"), (u(s, id, lit("src")) * 20).cast("int").cast("string"))
        .as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  // ------------------------------------------------------------ embeddings

  /** Embedding near-dup plant rate: fraction of vectors that are a
    * tiny-noise copy (cosine ≈ 1) of an earlier vector's content.
    */
  val EmbDupRate = 0.02

  /** Embeddings matching the driver's embeddings.parquet shape: vec_id,
    * embedding (float[dim]), label (0..labels-1). Each label owns a unit
    * hash-derived center; a vector is center·w + uniform noise — loose
    * clusters (the regime IVF/PQ/beam ANN are built for; w=0 degenerates
    * to the driver's isotropic corpus). ~2% of rows are planted near-dups
    * of an earlier row (noise 1e-3), content-addressed like documents.
    */
  def embeddings(spark: SparkSession, n: Long, seed: Long = 42L,
                 dim: Int = 64, labels: Int = 10,
                 clusterWeight: Double = 0.6): DataFrame = {
    val s = lit(seed)
    val id = col("id")
    val back = (u(s, id, lit("edupsrc")) * DupWindow).cast("long") + 1L
    val isDup = u(s, id, lit("edup")) < EmbDupRate && id >= 1L
    val canonical = when(isDup, greatest(id - back, lit(0L))).otherwise(id)
    val label = (u(s, canonical, lit("lab")) * labels).cast("int")
    def vec(cid: Column, lab: Column): Column = transform(
      sequence(lit(0), lit(dim - 1)),
      d => ((u(s, lab, lit("center"), d) * 2.0 - 1.0) * clusterWeight +
        (u(s, cid, lit("comp"), d) * 2.0 - 1.0)).cast("float"))
    val base = vec(canonical, label)
    // dup rows: canonical's vector nudged by ±1e-3 per component
    val dupVec = transform(sequence(lit(0), lit(dim - 1)),
      d => (element_at(base, d + 1) +
        ((u(s, id, lit("nudge"), d) * 2.0 - 1.0) * 1e-3).cast("float"))
        .cast("float"))
    spark.range(n).select(
      id.as("vec_id"),
      when(isDup, dupVec).otherwise(base).as("embedding"),
      label.as("label"))
  }

  // ----------------------------------------------------------------- ticks

  /** Reference-shape mock tick feed (generate_mock_ticks.py:10-63:
    * timestamp/symbol/price/volume): per-symbol geometric price path with
    * drift + volatility, heavy-tailed volumes. The reference's
    * `cumsum(normal)` walk is inherently sequential; the distributed
    * re-expression is a multiresolution hash walk — W(i) = Σ_level
    * u(seed, sym, level, i >> level) — whose adjacent-step variance is
    * O(1) and whose long-range variance grows ~linearly with distance
    * (each halving level contributes when the dyadic prefix changes), so
    * bars/indicators see random-walk-like paths, yet every price is an
    * O(log n)-term pure function of (seed, symbol, i): content-addressed,
    * no sequential scan anywhere.
    */
  def ticks(spark: SparkSession, nPerSymbol: Long,
            symbols: Seq[(String, Double)] = Seq(
              "AAPL" -> 150.0, "MSFT" -> 300.0, "GOOGL" -> 120.0,
              "AMZN" -> 130.0, "TSLA" -> 200.0),
            seed: Long = 42L, tickIntervalMs: Long = 100L,
            volatility: Double = 0.02, trend: Double = 0.0001): DataFrame = {
    val s = lit(seed)
    val levels = math.max(1,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, nPerSymbol - 1)))
    val symDf = spark.createDataFrame(symbols).toDF("symbol", "start_price")
    val idx = spark.range(nPerSymbol).select(col("id").as("i"))
    val df = idx.crossJoin(broadcast(symDf))
    // W(i): sum over dyadic levels of u[-1,1] hashes of the level prefix.
    // Each step flips level l's term with prob 2^-l → per-step variance
    // ≈ (2/3)·Σ 2^-l·1 bounded; calibrate so one step ≈ `volatility`.
    val w = (0 until levels).map { l =>
      (u(s, col("symbol"), lit(l), shiftrightunsigned(col("i"), l)) * 2.0 - 1.0)
    }.reduce(_ + _)
    val stepStd = math.sqrt(2.0 / 3.0) // per-level flip variance scale
    val price = col("start_price") *
      exp(lit(trend) * col("i") + w * (volatility / stepStd))
    df.select(
      timestamp_micros(lit(1704067200000000L) +
        col("i") * (tickIntervalMs * 1000L)).as("timestamp"),
      col("symbol"),
      round(price, 6).as("price"),
      // lognormal-ish volume: exp(normal(3,1)) · 100, Irwin–Hall normal
      round(exp(lit(3.0) +
        ((0 until 4).map(k => u(s, col("symbol"), col("i"), lit(s"v$k")))
          .reduce(_ + _) - 2.0) * math.sqrt(3.0)) * 100.0, 0).as("volume"))
  }

  // ------------------------------------------------------------ file suite

  /** Write a generated suite to `dir` in the testdata layout
    * ({events,documents,embeddings}.parquet) so every rehearsal tool can
    * point SPARK_GRAFT_SF_DIR at it. `sf` scales row counts off the
    * driver's sf=1-equivalent densities (sf0.01 ≡ 10k events, 500 docs,
    * 500 vectors).
    */
  def writeSuite(spark: SparkSession, dir: String, sf: Double,
                 seed: Long = 42L): Unit = {
    val nEvents = math.max(1L, math.round(sf * 1000000L))
    val nDocs = math.max(1L, math.round(sf * 50000L))
    val nEmb = math.max(1L, math.round(sf * 50000L))
    events(spark, nEvents, seed).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    documents(spark, nDocs, seed).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    embeddings(spark, nEmb, seed).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
  }
}
