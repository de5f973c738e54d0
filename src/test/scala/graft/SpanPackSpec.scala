package graft

import graft.operators.SpanPack
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class SpanPackSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Positional 3-gram stream for a toy docs frame — same shape the
    * memoized corpus scan feeds the production query.
    */
  private def pos3(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(col("*"),
        lead(col("tok"), 1).over(w).as("t1"),
        lead(col("tok"), 2).over(w).as("t2"))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), col("pos"),
        concat_ws(" ", col("tok"), col("t1"), col("t2")).as("shingle"))
  }

  test("dup spans merge to maximal runs, keep gaps, ignore doc-local repetition") {
    val docs = Seq(
      (1L, "a b c d Z e f g h"),   // shares [a b c d] and [e f g h] with doc 2, gap at Z
      (2L, "x y a b c d q r s t u v e f g h"),
      (3L, "p p p p p q")          // trigram repeats WITHIN the doc only -> not duplicated
    ).toDF("doc_id", "text")
    val spans = SpanPack.dupSpansFrom(pos3(docs))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(spans === Set(
      (1L, 0L, 3L, 4L), (1L, 5L, 8L, 4L),
      (2L, 2L, 5L, 4L), (2L, 12L, 15L, 4L)))
  }

  test("adjacent covered runs merge into one maximal span") {
    // doc 1 = doc 2's two shared runs back to back: coverage is
    // contiguous, so the two runs are ONE maximal span
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x y a b c d q r s t u v e f g h")
    ).toDF("doc_id", "text")
    val spans = SpanPack.dupSpansFrom(pos3(docs))
      .filter(col("doc_id") === 1L)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(spans.toSeq === Seq((0L, 7L)))
  }

  test("dup stats aggregate the span table consistently") {
    val spans = SpanPack.dupSpans(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    val byDoc = spans.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val stats = SpanPack.dupStats(spark, TestSpark.Sf).collect()
    assert(stats.nonEmpty)
    val totalDup = stats.map(_.getAs[Long]("dup_tokens")).sum
    assert(totalDup === byDoc.values.sum, "source-level dup mass must equal the span table's")
    assert(stats.map(_.getAs[Long]("n_dup_docs")).sum === byDoc.size.toLong)
    stats.foreach { r =>
      assert(r.getAs[Long]("dup_tokens") <= r.getAs[Long]("total_tokens"))
      assert(r.getAs[Long]("n_dup_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("dup_ratio") ===
        r.getAs[Long]("dup_tokens").toDouble / r.getAs[Long]("total_tokens"))
    }
  }

  private def randomDocs(seed: Int, n: Int): DataFrame = {
    val rnd = new Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    (1 to n).map { i =>
      val len = 1 + rnd.nextInt(40)
      val text = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i.toLong, s"s${1 + rnd.nextInt(3)}", text)
    }.toDF("doc_id", "source", "text")
  }

  test("pack offsets tile each source exactly: contiguous, gap-free, deterministic") {
    val docs = randomDocs(seed = 7, n = 200)
    val out = SpanPack.packContextsFrom(docs)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._3) // by start_off
      var expectStart = 0L
      sorted.foreach { case (_, nTok, start, firstCtx, lastCtx) =>
        assert(start === expectStart, "offsets must tile with no gap or overlap")
        assert(firstCtx === start / SpanPack.ContextLen)
        assert(lastCtx === (start + nTok - 1) / SpanPack.ContextLen)
        expectStart = start + nTok
      }
    }
    // deterministic under a different physical partitioning
    val again = SpanPack.packContextsFrom(docs.repartition(7))
      .collect().map(_.toSeq)
    assert(again.toSeq === SpanPack.packContextsFrom(docs).collect().map(_.toSeq).toSeq)
    // and INVARIANT to the bucket fan-out (the auto-sized knob changes
    // only the decomposition, never the layout)
    val wider = SpanPack.packContextsFrom(docs, prefixLen = 3)
      .collect().map(_.toSeq)
    assert(wider.toSeq === again.toSeq)
  }

  test("property: dup spans equal a brute-force sequential reference on random corpora") {
    for (seed <- Seq(3, 17, 29)) {
      val rnd = new Random(seed)
      // tiny vocab + short docs -> dense cross-doc trigram collisions,
      // exercising merge/gap/boundary paths hard
      val vocab = Vector("a", "b", "c", "d")
      val docs = (1 to 60).map { i =>
        val len = 3 + rnd.nextInt(12)
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val brute: Set[(Long, Long, Long, Long)] = {
        val tris = docs.flatMap { case (id, text) =>
          text.split(" ", -1).sliding(3).zipWithIndex.collect {
            case (w, p) if w.size == 3 => (id, p.toLong, w.mkString(" "))
          }
        }
        val dupSh = tris.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
        tris.filter(t => dupSh(t._3)).groupBy(_._1).flatMap { case (id, occ) =>
          val covered = occ.flatMap(t => t._2 to t._2 + 2).toSet
          // contiguous covered runs = maximal spans
          covered.toSeq.sorted.foldLeft(List.empty[(Long, Long)]) {
            case ((s0, e0) :: rest, p) if p == e0 + 1 => (s0, p) :: rest
            case (acc, p) => (p, p) :: acc
          }.map { case (s0, e0) => (id, s0, e0, e0 - s0 + 1) }
        }.toSet
      }
      val got = SpanPack.dupSpansFrom(pos3(docs.toDF("doc_id", "text")))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got === brute, s"seed=$seed")
    }
  }

  test("bucket prefix length scales with corpus count and caps at 6") {
    assert(SpanPack.packPrefixLen(5000L) === 2)
    assert(SpanPack.packPrefixLen(256L * 1000000L) === 2)
    assert(SpanPack.packPrefixLen(256L * 1000000L + 1) === 3)
    assert(SpanPack.packPrefixLen(Long.MaxValue / 4) === 6)
  }

  test("property: two-level prefix sum equals the sequential single-window scan") {
    for (seed <- Seq(11, 23, 31)) {
      val docs = randomDocs(seed, n = 150 + seed)
      val brute = docs.select(
        col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        md5(col("text")).as("h"))
        .withColumn("end_off",
          sum(col("n_tokens")).over(Window.partitionBy("source").orderBy("h", "doc_id")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("source"), col("doc_id"), (col("end_off") - col("n_tokens")).as("start_off"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val packed = SpanPack.packContextsFrom(docs)
        .select("source", "doc_id", "start_off")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(packed === brute, s"seed=$seed")
    }
  }
}
