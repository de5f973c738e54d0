package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-based near-dup detection: MinHash+LSH and SimHash.
  *
  * No DuckDB oracle — the operators are defined by Spark's xxhash64 /
  * a 64-bit FNV, which no second engine reproduces; the driver records
  * the rows-only check and `DedupSpec` asserts recall against the exact
  * n-gram-Jaccard pairs (TextPack.q_dedup_ngram_jaccard is the oracle-
  * checked ground truth).
  *
  * Scale shape: signatures are fixed-width per doc (32 hashes), LSH
  * shuffles on (band, signature) buckets — linear in corpus size, never
  * all-pairs. Candidate verification joins shingle sets only for
  * bucket-collision pairs.
  */
object DedupPack extends QueryPack {

  val NumPerms = 32
  val NumBands = 8 // 4 rows per band

  /** MinHash values: (doc_id, perm, mh) — explode the permutation index,
    * hash, min-aggregate. Every stage is codegen'd; the groupBy shuffles
    * fixed-width (doc, perm) keys only.
    */
  def minhashSignatures(docs: DataFrame): DataFrame =
    minhashFromShingles(TextPack.shingles(docs).select("doc_id", "shingle"))

  /** Same, over an existing (doc_id, shingle) set (lets callers share a
    * cached shingle table).
    */
  def minhashFromShingles(shd: DataFrame): DataFrame =
    shd
      .withColumn("perm", explode(sequence(lit(0), lit(NumPerms - 1))))
      .withColumn("h", xxhash64(col("perm"), col("shingle")))
      .groupBy("doc_id", "perm").agg(min(col("h")).as("mh"))

  /** LSH band keys: (doc_id, band, sig) — NumBands rows per doc. */
  def bandSignatures(mh: DataFrame): DataFrame =
    mh.withColumn("band", expr(s"perm div ${NumPerms / NumBands}"))
      .withColumn("rib", col("perm") % (NumPerms / NumBands))
      .groupBy("doc_id", "band")
      .agg(xxhash64(
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_minhash_lsh" -> ((s, d) => {
      // the session-cached shingle table feeds signatures, verification,
      // and sizes (shared with the jaccard pipeline)
      val shd = TextPack.shinglesCached(s, d)
      val sig = bandSignatures(minhashFromShingles(shd))
      val a = sig.select(col("doc_id").as("doc1"), col("band"), col("sig"))
      val b = sig.select(col("doc_id").as("doc2"), col("band"), col("sig"))
      val cand = a.join(b, Seq("band", "sig")).filter(col("doc1") < col("doc2"))
        .groupBy("doc1", "doc2").agg(count(lit(1)).as("n_bands_matched"))
        .cache()
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

  def oracles: Map[String, String] = Map.empty
}
