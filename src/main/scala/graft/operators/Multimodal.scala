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
        length(col("text")).cast("long").as("byte_len"),
        md5(col("text")).as("content_md5")).as("meta"))

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
