package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing (SURVEY.md §2.6): image/audio/video payloads
 * are opaque `binary` columns with a typed metadata struct, processed
 * partition-wise so a real decoder batches per-task (the Scala analog of
 * `mapInPandas`: one iterator per partition, constant memory, no
 * per-row JVM<->native round trips).
 *
 * The decode step itself is STUBBED — the container has no image/audio
 * libraries — with [[StubDecoder]], a deterministic fake that derives
 * features from the raw bytes. The Spark-side plumbing (schema, binary
 * column handling, partition-wise batch iteration, feature schema) is
 * real and tested; swapping [[StubDecoder]] for a JNI/FFI decoder changes
 * nothing structurally.
 */
object Multimodal {

  /** One media record: the opaque payload plus typed metadata — the shape
    * a 100 TB multimodal table has (payload column stays unread unless the
    * query touches it; parquet column pruning does the rest). */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte], mime: String)

  /** Extracted features. Deterministic given the payload bytes. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      mean_byte: Double,
      width: Int,
      height: Int)

  /**
   * The stubbed decoder: stands in for image decode / feature extraction.
   * Deterministic byte statistics play the role of decoded features:
   * "width"/"height" from the first/last byte, mean byte value as the
   * stand-in embedding statistic. A real decoder has this exact
   * signature: bytes in, typed features out.
   */
  object StubDecoder {
    def decode(docId: Long, payload: Array[Byte]): MediaFeatures = {
      val n = payload.length
      var sum = 0L
      var i = 0
      while (i < n) { sum += payload(i) & 0xff; i += 1 }
      // Raw IEEE division — rounding is left to the query layer, which
      // uses the explicit floor form (engine round() diverges at half
      // boundaries across engines; see TextFunctions.fround).
      val mean = if (n == 0) 0.0 else sum.toDouble / n
      MediaFeatures(
        doc_id = docId,
        n_bytes = n.toLong,
        mean_byte = mean,
        width = if (n == 0) 0 else payload(0) & 0xff,
        height = if (n == 0) 0 else payload(n - 1) & 0xff)
    }
  }

  /** Build a media table from `documents`: the UTF-8 text bytes stand in
    * for an encoded image payload (deterministic, so oracle-checkable). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("application/octet-stream").as("mime"))

  /**
   * Partition-wise feature extraction — the `mapInPandas` analog. Each
   * task iterates its partition once through the (stub) decoder; the
   * output is a typed Dataset whose schema downstream SQL composes with.
   */
  def extractFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => StubDecoder.decode(id, bytes) })
  }

  /** One sampled "frame": the payload byte at an evenly-spaced offset —
    * the video-frame-sampling shape (k frames per clip regardless of
    * duration). */
  final case class FrameSample(doc_id: Long, frame_idx: Int, frame_val: Int)

  /**
   * Frame sampling: k evenly-spaced single-byte samples per payload
   * (offset_i = floor(i·n/k)) — the stand-in for decoding k frames from
   * a video byte stream. Same partition-wise iteration as
   * [[extractFeatures]]; a real frame decoder replaces the byte read.
   * Empty payloads contribute no frames.
   */
  def sampleFrames(media: DataFrame, k: Int)(
      implicit spark: SparkSession): Dataset[FrameSample] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val n = bytes.length
        if (n == 0) Iterator.empty
        else (0 until k).iterator.map { i =>
          FrameSample(id, i, bytes((i * n) / k) & 0xff)
        }
      })
  }

  /** One "pixel" of the resized payload: the byte-sum and width of one
    * of k equal spans — the downsample/thumbnail shape. */
  final case class ResizedBucket(doc_id: Long, bucket: Int,
      sum_bytes: Long, n_in_bucket: Long)

  /**
   * Resize (downsample) to k buckets: bucket b covers byte span
   * [⌊b·n/k⌋, ⌊(b+1)·n/k⌋) and reports its byte-sum and width — integer
   * outputs so the result is exactly oracle-comparable (a real resize
   * averages pixels; the span arithmetic is identical). Empty payloads
   * contribute no buckets.
   */
  def resize(media: DataFrame, k: Int)(
      implicit spark: SparkSession): Dataset[ResizedBucket] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val n = bytes.length
        if (n == 0) Iterator.empty
        else (0 until k).iterator.map { b =>
          val lo = (b * n) / k
          val hi = ((b + 1) * n) / k
          var s = 0L
          var p = lo
          while (p < hi) { s += bytes(p) & 0xff; p += 1 }
          ResizedBucket(id, b, s, (hi - lo).toLong)
        }
      })
  }
}
