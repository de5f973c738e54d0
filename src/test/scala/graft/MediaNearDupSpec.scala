package graft

import graft.operators.{DedupPack, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the perceptual media near-dup contract (q_media_neardup):
  * a near-identical media pair that exact md5 CANNOT catch (one edited
  * character) must pair within the hamming bound, while unrelated media
  * must not pair. Also pins the locality property that makes the hash
  * perceptual: a local edit flips at most two gradient bits.
  */
class MediaNearDupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // deterministic >= 504-char "media" so every grid sample position is
  // hit at most once and an edit perturbs exactly one cell
  private def mkText(seed: Int, len: Int = 600): String = {
    val sb = new StringBuilder
    var x = seed
    while (sb.length < len) {
      x = (x * 1103515245 + 12345) & 0x7fffffff
      sb.append(('a' + x % 26).toChar).append(if (x % 7 == 0) ' ' else 'k')
    }
    sb.toString.take(len)
  }

  test("one-char edit pairs perceptually although its md5 differs") {
    val base = mkText(1)
    val edited = base.updated(300, 'Z') // substitution mid-item
    val other = mkText(2)
    val docs = Seq((1L, base), (2L, edited), (3L, other))
      .toDF("doc_id", "text")

    // the exact gate misses the pair
    val md5s = docs.select(md5(col("text"))).collect().map(_.getString(0))
    assert(md5s.distinct.length == 3, "all three are exact-distinct")

    val ph = Multimodal.perceptualHash(docs).withColumnRenamed("phash", "simhash")
    val pairs = DedupPack.simhashPairs(ph)
      .select("doc1", "doc2", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists { case (a, b, _) => a == 1L && b == 2L },
      "near-identical pair flagged")
    // locality: one perturbed cell feeds two horizontal gradients
    val h12 = pairs.collect { case (1L, 2L, h) => h }.head
    assert(h12 <= 2, s"local edit flips at most two bits, got $h12")
    assert(!pairs.exists { case (a, b, _) => Set(a, b) == Set(1L, 3L) },
      "unrelated media not paired")
  }

  test("native PHash56 is bit-identical to the composed-builtin form, both eval paths") {
    // adversarial: empty, single char, spaces, multibyte (2/3/4-byte
    // codepoints), shorter-than-grid, exactly-grid-sized, long — plus the
    // real corpus. The builtin form (ascii/substr/length, codepoint
    // semantics) is the independent reference the DuckDB mirror spells.
    val edge = Seq("", "a", " ", "  ", "ab", "héllo wörld", "日本語テスト",
      "😀😀 astral 😀", mkText(3, 100), mkText(4, 504), mkText(5, 2000))
      .zipWithIndex.map { case (t, i) => (2000L + i, t) }
    val edgeDf = edge.toDF("doc_id", "text")
    val corpus = Tables.documents(spark, TestSpark.Sf).select("doc_id", "text")
    for (docs <- Seq(edgeDf, corpus)) {
      val native = Multimodal.perceptualHash(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val builtin = Multimodal.perceptualHashHof(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(native == builtin, "native PHash56 diverged from the builtin form")
    }
    // interpreted path (no codegen): direct expression eval must match too
    for ((_, t) <- edge) {
      val e = graft.functions.PHash56Expr(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(t),
          org.apache.spark.sql.types.StringType))
      val viaDf = Seq((0L, t)).toDF("doc_id", "text")
      val expect = Multimodal.perceptualHashHof(viaDf).collect().head.getLong(1)
      assert(e.eval(null) == expect, s"interpreted PHash56 diverged on '${t.take(20)}'")
    }
  }

  test("malformed/truncated UTF-8 degrades to codepoint 0, no exception") {
    import org.apache.spark.unsafe.types.UTF8String
    // lone multibyte leading bytes, truncated continuation tails, and a
    // valid prefix with a truncated last sequence — the binary-to-string
    // cast shapes the composed substr/ascii form tolerates
    val bad = Seq(
      Array(0xE2.toByte),                                  // 3-byte lead, no tail
      Array(0xF0.toByte, 0x9F.toByte),                     // 4-byte lead, 1 tail
      Array(0xC3.toByte),                                  // 2-byte lead, no tail
      Array('a'.toByte, 'b'.toByte, 0xE4.toByte, 0xB8.toByte)) // valid prefix
    for (b <- bad) {
      val h = graft.functions.PHash56.phash(UTF8String.fromBytes(b))
      assert(h >= 0L && h < (1L << 56), s"phash out of range on ${b.toSeq}")
    }
  }

  test("identical media hash identically; hash is 56-bit") {
    val t = mkText(7)
    val docs = Seq((10L, t), (11L, t)).toDF("doc_id", "text")
    val hs = Multimodal.perceptualHash(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hs(10L) == hs(11L))
    assert(hs(10L) >= 0L && hs(10L) < (1L << 56))
  }
}
