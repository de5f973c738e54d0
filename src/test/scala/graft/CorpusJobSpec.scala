package graft

import graft.sources.CorpusJob
import graft.operators.{CorpusPack, TextPack}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end corpus-job invariants. The manifest's VALUES are oracled
  * in DuckDB (the composed CTE chain); these pin what the hash compare
  * can't: the physical shard write matches the manifest, and the
  * manifest equals an INDEPENDENT driver-side composition of the
  * registered individual queries (exact dedup + corpus filter + mix +
  * a sequential pack fold).
  */
class CorpusJobSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.Sf

  private def h14(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    java.lang.Long.parseLong(md.take(7).map(b => f"$b%02x").mkString, 16)
  }

  private def md5Hex(t: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  test("manifest equals a driver-side composition of the individual queries") {
    // kept set from the REGISTERED queries (not CorpusJob's own frames)
    val exactKeep = SparkEntry.queries("q_dedup_exact_docs")(s, d)
      .select(col("keep_doc_id").as("doc_id")).collect().map(_.getLong(0)).toSet
    val filterKeep = SparkEntry.queries("q_corpus_filter")(s, d)
      .filter(col("kept") === 1).select("doc_id").collect().map(_.getLong(0)).toSet
    val alloc = SparkEntry.queries("q_mix_temperature")(s, d)
      .select("source", "alloc_tokens").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = Tables.documents(s, d).select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .filter { case (_, id, _) => exactKeep(id) && filterKeep(id) }
    // sequential pack fold per source in (md5(text), doc_id) order
    case class Row(source: String, docId: Long, nTok: Long, startOff: Long,
                   nCtx: Long, split: Int)
    val packed = docs.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      var off = 0L
      ds.map { case (_, id, t) => (md5Hex(t), id, t.split(" ", -1).length.toLong) }
        .sortBy { case (h, id, _) => (h, id) }
        .flatMap { case (_, id, n) =>
          val start = off; off += n
          if (start < alloc(src)) {
            val first = start / 512; val last = (off - 1) / 512
            Some(Row(src, id, n, start, last - first + 1, if (last > first) 1 else 0))
          } else None
        }
    }
    val expected = packed.groupBy(r => h14(r.docId) % CorpusPack.NShards).map {
      case (shard, rs) =>
        (shard, rs.size.toLong, rs.map(_.nTok).sum, rs.map(_.nCtx).sum,
          rs.map(_.split.toLong).sum, rs.map(r => h14(r.docId)).min,
          rs.map(r => h14(r.docId)).max,
          rs.map(r => r.docId % CorpusPack.ChecksumP).sum % CorpusPack.ChecksumP)
    }.toSet
    val got = CorpusJob.manifest(s, d).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(got === expected)
  }

  test("physical shard write matches the manifest") {
    val out = java.nio.file.Files.createTempDirectory("corpusjob").toString
    try {
      val manifest = CorpusJob.run(s, d, out).collect()
        .map(r => r.getAs[Long]("shard") ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("min_h"), r.getAs[Long]("max_h"),
            r.getAs[Long]("id_checksum"))).toMap
      val shards = s.read.parquet(s"$out/shards")
        .select(col("shard").cast("long"), col("doc_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val byShard = shards.groupBy(_._1)
      assert(byShard.keySet === manifest.keySet)
      byShard.foreach { case (shard, rows) =>
        val (nDocs, minH, maxH, checksum) = manifest(shard)
        val hs = rows.map { case (_, id) => h14(id) }
        assert(rows.length.toLong === nDocs, s"shard $shard doc count")
        assert(hs.min === minH && hs.max === maxH, s"shard $shard hash range")
        assert(rows.map(_._2 % CorpusPack.ChecksumP).sum % CorpusPack.ChecksumP
          === checksum, s"shard $shard checksum")
        // layout contract: every doc is in the shard its hash names
        rows.foreach { case (sh, id) => assert(h14(id) % CorpusPack.NShards === sh) }
      }
      // the written doc set IS the mixed layout's doc set
      val written = shards.map(_._2).toSet
      val layout = CorpusJob.mixedLayout(s, d).select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(written === layout)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(out)).deleteRecursively()
    }
  }

  test("dedup savings: monotone gates, mass conservation vs the memo frames") {
    import org.apache.spark.sql.functions._
    val out = CorpusJob.queries("q_dedup_savings")(s, d).cache()
    // gates only remove mass, in order: clean <= exact <= raw
    assert(out.filter(col("tokens_exact") > col("n_tokens")).count() === 0)
    assert(out.filter(col("tokens_clean") > col("tokens_exact")).count() === 0)
    assert(out.filter(col("n_docs_clean") > col("n_docs_exact")).count() === 0)
    // raw mass equals the documents table; clean mass equals cleanedDocs
    val rawDocs = Tables.documents(s, d).count()
    assert(out.agg(sum("n_docs")).head.getLong(0) === rawDocs)
    val cleanDocs = CorpusJob.cleanedDocs(s, d).count()
    assert(out.agg(sum("n_docs_clean")).head.getLong(0) === cleanDocs)
    out.unpersist()
  }
}
