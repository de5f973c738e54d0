package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary media + typed metadata, with
  * the decode step as a batched per-partition boundary.
  *
  * The container has no image/audio codecs, so `decodeStub` derives
  * deterministic pseudo-features from the raw bytes — the Spark-side
  * shape (binary column, metadata struct, mapPartitions batching,
  * fixed-width feature vector) is the real, tested contract; a deployment
  * swaps the body for an actual decoder (JNI codec / ONNX session per
  * partition, amortized across the iterator).
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte])
  case class MediaFeatures(doc_id: Long, byte_len: Int, width: Int, height: Int,
                           features: Array[Float])

  /** documents → (doc_id, media binary, metadata struct). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(col("text")).cast("long").as("byte_len"),
        md5(col("text")).as("content_md5")).as("meta"))

  case class Frame(doc_id: Long, frame_idx: Int, width: Int, height: Int,
                   pixels: Array[Byte])

  /** Frame sampling: every `nth` frame of each media item. Frame count
    * follows the q_media_metadata arithmetic (1 + len % 30); the decoded
    * "pixels" are a deterministic stride over the source bytes — the real
    * contract is the shape: one item fans out to a bounded frame set
    * inside its partition (no shuffle), each frame a fixed-size payload.
    */
  def frameSample(media: Dataset[MediaRow], nth: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // real impl: open demuxer/codec once per partition here
      it.flatMap { row =>
        val n = row.media.length
        val nFrames = 1 + n % 30
        val w = 64 + n % 576
        val h = 64 + (n * 7) % 416
        (0 until nFrames by nth).iterator.map { k =>
          val px = new Array[Byte](64)
          var i = 0
          while (i < 64) { px(i) = if (n > 0) row.media((k + i * 31) % n) else 0; i += 1 }
          Frame(row.doc_id, k, w, h, px)
        }
      }
    }
  }

  /** Resize: deterministic re-stride of the stub pixels to `w`×`h`-coded
    * payload size (capped stub payload of 64 bytes keeps the fixture
    * small; a real impl swaps in an image op per partition session).
    */
  def resizeStub(frames: Dataset[Frame], w: Int, h: Int): Dataset[Frame] = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.mapPartitions { it =>
      it.map { f =>
        val out = new Array[Byte](math.min(64, math.max(1, w * h / 64)))
        var i = 0
        while (i < out.length) { out(i) = f.pixels(i * f.pixels.length / out.length); i += 1 }
        f.copy(width = w, height = h, pixels = out)
      }
    }
  }

  /** 56-bit dHash-class PERCEPTUAL hash over the stub-decoded media
    * (VERDICT r13 task 5 — media near-dup beyond exact md5).
    *
    * Shape is the classic dHash: "resize" the item to a fixed brightness
    * grid (here 7 rows x 9 cols, each cell the integer sum of 8 sampled
    * character codepoints striding the whole item — the stub decoder;
    * a real deployment swaps the sampler for a grayscale resize), then
    * bit(r, c) = cell(r, c) < cell(r, c + 1): 7 x 8 = 56 horizontal
    * gradient bits. A local edit perturbs one cell, flipping at most two
    * bits, while exact md5 changes completely — exactly the near-identity
    * class md5 dedup misses. 56 bits so the signature rides the existing
    * SimHash56 band machinery (4 bands x 14 bits, pigeonhole hamming <= 3
    * always collides; DedupPack.simhashPairs) unchanged.
    *
    * Integer end-to-end (codepoint sums, comparisons, bit sums), so the
    * DuckDB mirror is exact. (j * n) / 504.0 with a cast is exact integer
    * division: j * n <= 503 * len << 2^53, and the true quotient is
    * either representable or >= 1/504 away from the next integer.
    */
  def perceptualHash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), graft.functions.PHash56(col("text")).as("phash"))

  /** The original composed-builtin form of [[perceptualHash]]'s column —
    * kept as the independent reference the parity spec pins the native
    * kernel against (MediaNearDupSpec). NOT for the query path: the
    * nested HOFs are interpreted CodegenFallback, measured ~1.3 ms/doc
    * at sf0.1 and re-evaluated per consumer (see PHash56's scaladoc).
    */
  def perceptualHashHof(docs: DataFrame): DataFrame = {
    val n = length(col("text")).cast("long")
    val cells = transform(sequence(lit(0L), lit(62L)), k =>
      aggregate(sequence(lit(0L), lit(7L)), lit(0L), (acc, s2) =>
        acc + ascii(col("text").substr(
          (lit(1.0) + (k * 8 + s2) * n / lit(504.0)).cast("int"),
          lit(1))).cast("long")))
    val hash = (0 until 56).map { b =>
      val k1 = (b / 8) * 9 + (b % 8) // element_at is 1-based
      when(element_at(col("__cells"), k1 + 1) < element_at(col("__cells"), k1 + 2),
        lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    docs.select(col("doc_id"), cells.as("__cells"))
      .select(col("doc_id"), hash.as("phash"))
  }

  /** The stubbed decoder: one codec "session" per partition, batch
    * iteration, fixed 8-wide feature vector per item.
    */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // real impl: open codec/session once per partition here
      it.map { row =>
        val bytes = row.media
        val n = bytes.length
        val feats = new Array[Float](8)
        var i = 0
        while (i < n) { feats(i % 8) += (bytes(i) & 0xff) / 255.0f; i += 1 }
        var j = 0
        while (j < 8) { feats(j) = feats(j) / math.max(1, n / 8).toFloat; j += 1 }
        MediaFeatures(row.doc_id, n, 64 + n % 576, 64 + (n * 7) % 416, feats)
      }
    }
  }
}
