package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-based near-dup detection: MinHash+LSH and SimHash.
  *
  * MinHash is ORACLED (r10): the permutation family is portable exact
  * integer arithmetic — base = first 14 hex digits of md5(shingle) (a
  * 56-bit integer both engines produce identically), permuted by 32
  * baked LCG pairs as (a·base + b) mod (2^31−1). Spark computes the
  * modmul overflow-free in longs via a 2^28 split (a·hi ≤ 2^59,
  * partial results ≤ 2^59 — never near 2^63); DuckDB does it directly
  * in HUGEINT. Band keys are the plain concatenation of the 4 row
  * minhashes — no engine-specific hash anywhere. SimHash stays
  * rows-only (defined by a 64-bit FNV token fold; `DedupSpec` pins the
  * native expression against the reference kernel).
  *
  * Scale shape: signatures are fixed-width per doc (32 hashes), LSH
  * shuffles on (band, signature) buckets — linear in corpus size, never
  * all-pairs. Candidate verification joins shingle sets only for
  * bucket-collision pairs.
  */
object DedupPack extends QueryPack {

  val NumPerms = 32
  val NumBands = 8 // 4 rows per band

  /** Mersenne modulus for the permutation family. */
  val MinhashP = 2147483647L // 2^31 - 1, prime

  /** Deterministic (perm, a, b) constants from the same LCG the
    * hyperplane oracle bakes (Ann.hyperplanes): a ∈ [1, P−1] so the
    * permutation never degenerates, b ∈ [0, P). Identical literals are
    * emitted into the DuckDB mirror's VALUES list.
    */
  val PermConsts: Seq[(Int, Long, Long)] = {
    val (lA, lC, lM) = (1103515245L, 12345L, 2147483648L)
    (0 until NumPerms).map { p =>
      val r1 = (p * lA + lC) % lM
      val r2 = (r1 * lA + lC) % lM
      val r3 = (r2 * lA + lC) % lM
      (p, r2 % (MinhashP - 1) + 1, r3 % MinhashP)
    }
  }

  /** MinHash values: (doc_id, perm, mh) — explode the permutation index,
    * hash, min-aggregate. Every stage is codegen'd; the groupBy shuffles
    * fixed-width (doc, perm) keys only.
    */
  def minhashSignatures(docs: DataFrame): DataFrame =
    minhashFromShingles(TextPack.shingles(docs).select("doc_id", "shingle"))

  /** Same, over an existing (doc_id, shingle) set (lets callers share a
    * cached shingle table). One md5 per shingle (cheaper than the 32
    * xxhash64 calls of the pre-r10 form), then 32 long modmuls against
    * the broadcast constant table.
    */
  def minhashFromShingles(shd: DataFrame): DataFrame = {
    val s = shd.sparkSession
    import s.implicits._
    val perms = PermConsts.toDF("perm", "a", "b")
    val hi = shiftright(col("base"), 28)
    val lo = col("base").bitwiseAND(lit((1L << 28) - 1))
    // (a·base + b) mod P with base = hi·2^28 + lo, all intermediates
    // ≤ 2^59 (see object doc): exact on both engines
    val mh = (((col("a") * hi) % MinhashP) * lit(1L << 28) % MinhashP +
      (col("a") * lo) % MinhashP + col("b")) % MinhashP
    shd
      .withColumn("base", conv(substring(md5(col("shingle")), 1, 14), 16, 10).cast("long"))
      .crossJoin(broadcast(perms))
      .withColumn("h", mh)
      .groupBy("doc_id", "perm").agg(min(col("h")).as("mh"))
  }

  /** LSH band keys: (doc_id, band, sig) — NumBands rows per doc; the
    * band signature is the literal 4-minhash concatenation (portable,
    * and at ≤ 31 bits per value still a short shuffle key).
    */
  def bandSignatures(mh: DataFrame): DataFrame =
    mh.withColumn("band", expr(s"perm div ${NumPerms / NumBands}"))
      .withColumn("rib", col("perm") % (NumPerms / NumBands))
      .groupBy("doc_id", "band")
      .agg(concat_ws(",",
        max(when(col("rib") === 0, col("mh"))),
        max(when(col("rib") === 1, col("mh"))),
        max(when(col("rib") === 2, col("mh"))),
        max(when(col("rib") === 3, col("mh")))).as("sig"))

  /** FNV-1a 64-bit (the documented portable token hash for SimHash). */
  def fnv64(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0xcbf29ce484222325L)((h, b) => (h ^ (b & 0xff)) * 0x100000001b3L)

  /** 64-bit SimHash per doc over whitespace tokens (with multiplicity) —
    * the native codegen'd expression (graft.functions.SimHash64Expr); the
    * former typed mapPartitions kernel survives as [[simhashKernel]], the
    * spec's independent cross-check.
    */
  def simhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), graft.functions.SimHash64(col("text")).as("simhash"))

  /** Reference kernel for the SimHash expression (DedupSpec asserts the
    * codegen'd path is bit-identical to this per-row Scala fold).
    */
  def simhashKernel(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val counts = new Array[Int](64)
        text.split(" ").foreach { t =>
          val h = fnv64(t)
          var i = 0
          while (i < 64) {
            if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
            i += 1
          }
        }
        var sh = 0L
        var i = 0
        while (i < 64) { if (counts(i) > 0) sh |= (1L << i); i += 1 }
        (id, sh)
      })
      .toDF("doc_id", "simhash")
  }

  /** Session-memoized LSH candidate pairs (band-bucket collisions with
    * match counts) — referenced twice by the verification join below; a
    * bare per-call .cache() here lingered for the async ContextCleaner
    * (the r07 bench-neighborhood debt class) and re-derived the
    * signatures every call.
    */
  private val candCache =
    graft.Memo.map[(SparkSession, String), DataFrame](_.unpersist())

  private def candsCached(s: SparkSession, d: String): DataFrame =
    candCache.getOrElseUpdate((s, d), {
      val sig = bandSignatures(minhashFromShingles(TextPack.shinglesCached(s, d)))
      val a = sig.select(col("doc_id").as("doc1"), col("band"), col("sig"))
      val b = sig.select(col("doc_id").as("doc2"), col("band"), col("sig"))
      a.join(b, Seq("band", "sig")).filter(col("doc1") < col("doc2"))
        .groupBy("doc1", "doc2").agg(count(lit(1)).as("n_bands_matched"))
        .cache()
    })

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_minhash_lsh" -> ((s, d) => {
      // the session-cached shingle table feeds signatures, verification,
      // and sizes (shared with the jaccard pipeline)
      val shd = TextPack.shinglesCached(s, d)
      val cand = candsCached(s, d)
      val sizes = shd.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      // candidate-only verification: expand the (small, broadcast)
      // candidate pair set with doc1's shingles, then probe doc2's —
      // the full shingle self-join never runs, only |cand| × shingle
      // intersections do
      val inter = cand.select("doc1", "doc2")
        .join(shd.select(col("doc_id").as("doc1"), col("shingle")), "doc1")
        .join(shd.select(col("doc_id").as("doc2"), col("shingle")), Seq("doc2", "shingle"))
        .groupBy("doc1", "doc2").agg(count(lit(1)).as("inter"))
      cand.join(inter, Seq("doc1", "doc2"), "left")
        .withColumn("inter", coalesce(col("inter"), lit(0L)))
        .join(sizes.select(col("doc_id").as("doc1"), col("sz").as("sz1")), "doc1")
        .join(sizes.select(col("doc_id").as("doc2"), col("sz").as("sz2")), "doc2")
        .withColumn("jaccard", col("inter") / (col("sz1") + col("sz2") - col("inter")))
        .filter(col("jaccard") >= 0.5)
        .select("doc1", "doc2", "n_bands_matched", "inter", "sz1", "sz2", "jaccard")
        .orderBy("doc1", "doc2")
    }),
    "q_dedup_simhash" -> ((s, d) => {
      val sh = simhash(Tables.documents(s, d)).cache()
      val bands = sh.withColumn("band", explode(sequence(lit(0), lit(3))))
        .withColumn("key", expr("(simhash >> (band * 16)) & 65535"))
      val a = bands.select(col("doc_id").as("doc1"), col("simhash").as("sh1"), col("band"), col("key"))
      val b = bands.select(col("doc_id").as("doc2"), col("simhash").as("sh2"), col("band"), col("key"))
      a.join(b, Seq("band", "key")).filter(col("doc1") < col("doc2"))
        .select("doc1", "doc2", "sh1", "sh2").distinct()
        .withColumn("hamming", expr("bit_count(sh1 ^ sh2)").cast("long"))
        .filter(col("hamming") <= 6)
        .select(col("doc1"), col("doc2"), hex(col("sh1")).as("simhash1"),
          hex(col("sh2")).as("simhash2"), col("hamming"))
        .orderBy("doc1", "doc2")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_dedup_minhash_lsh" -> {
      val permValues = PermConsts
        .map { case (p, a, b) => s"($p, ${a}, ${b})" }.mkString(", ")
      s"""WITH ${TextPack.ShinglesCte},
         |perms(perm, a, b) AS (VALUES $permValues),
         |mh AS (
         |  SELECT s.doc_id, p.perm,
         |         CAST(min((p.a::HUGEINT * ('0x' || substr(md5(s.shingle), 1, 14))::BIGINT + p.b)
         |                  % ${MinhashP}) AS BIGINT) AS mh
         |  FROM (SELECT DISTINCT doc_id, shingle FROM shd) s CROSS JOIN perms p
         |  GROUP BY 1, 2
         |),
         |bands AS (
         |  SELECT doc_id, perm // ${NumPerms / NumBands} AS band,
         |         CAST(max(CASE WHEN perm % ${NumPerms / NumBands} = 0 THEN mh END) AS VARCHAR)
         |         || ',' || CAST(max(CASE WHEN perm % ${NumPerms / NumBands} = 1 THEN mh END) AS VARCHAR)
         |         || ',' || CAST(max(CASE WHEN perm % ${NumPerms / NumBands} = 2 THEN mh END) AS VARCHAR)
         |         || ',' || CAST(max(CASE WHEN perm % ${NumPerms / NumBands} = 3 THEN mh END) AS VARCHAR) AS sig
         |  FROM mh GROUP BY 1, 2
         |),
         |cand AS (
         |  SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS n_bands_matched
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |),
         |sizes AS (SELECT doc_id, count(DISTINCT shingle) AS sz FROM shd GROUP BY doc_id),
         |intr AS (
         |  SELECT c.doc1, c.doc2, count(DISTINCT s1.shingle) AS inter
         |  FROM cand c
         |  JOIN shd s1 ON s1.doc_id = c.doc1
         |  JOIN shd s2 ON s2.doc_id = c.doc2 AND s2.shingle = s1.shingle
         |  GROUP BY 1, 2
         |),
         |j AS (
         |  SELECT c.doc1, c.doc2, c.n_bands_matched,
         |         coalesce(i.inter, 0) AS inter, z1.sz AS sz1, z2.sz AS sz2,
         |         coalesce(i.inter, 0) / (z1.sz + z2.sz - coalesce(i.inter, 0)) AS jaccard
         |  FROM cand c
         |  LEFT JOIN intr i ON c.doc1 = i.doc1 AND c.doc2 = i.doc2
         |  JOIN sizes z1 ON c.doc1 = z1.doc_id
         |  JOIN sizes z2 ON c.doc2 = z2.doc_id
         |)
         |SELECT doc1, doc2, n_bands_matched, inter, sz1, sz2, jaccard
         |FROM j WHERE jaccard >= 0.5 ORDER BY doc1, doc2""".stripMargin
    }
  )
}
