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
      .mapPartitions(_.map { case (id, bytes) =>
        StubDecoder.decode(id, if (bytes == null) Array.emptyByteArray else bytes) })
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
      .mapPartitions(_.flatMap { case (id, raw) =>
        val bytes = if (raw == null) Array.emptyByteArray else raw
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
      .mapPartitions(_.flatMap { case (id, raw) =>
        val bytes = if (raw == null) Array.emptyByteArray else raw
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

  /**
   * Average-hash (aHash) of each payload — the classic perceptual image
   * fingerprint: downsample to `k` spans ([[resize]] — the stubbed
   * decode; a real pipeline hashes the decoded thumbnail), then bit b =
   * 1 iff span b's mean byte exceeds the payload's mean. The comparison
   * is the EXACT integer cross-multiply sum_b·n_total > total·n_b (no
   * division, no float), and the hash packs as Σ bit·2^b — a k ≤ 62-bit
   * BIGINT on both engines. Empty payloads emit no hash (nothing to
   * perceive); spans past the payload's end contribute 0-bits.
   * Payloads beyond ~190 MB would overflow the cross-multiply — raise
   * loudly rather than mis-hash.
   */
  def aHash(media: DataFrame, k: Int = 48)(
      implicit spark: SparkSession): DataFrame = {
    require(k >= 1 && k <= 62, s"k must be in [1, 62], got $k")
    val r = resize(media, k).toDF()
    val tot = r.groupBy("doc_id").agg(
      sum(col("sum_bytes")).as("total"), sum(col("n_in_bucket")).as("n_total"))
    r.join(tot, "doc_id")
      .select(col("doc_id"),
        // 255·n² must stay under 2⁶³: n ≤ ⌊√(2⁶³/255)⌋ = 190 M bytes
        when(col("n_total") > lit(190000000L),
          raise_error(lit("aHash: payload too large for exact cross-multiply")))
          .otherwise(lit(0L)).as("guard"),
        when(col("sum_bytes") * col("n_total") > col("total") * col("n_in_bucket"),
          expr("shiftleft(CAST(1 AS BIGINT), bucket)"))
          .otherwise(lit(0L)).as("bit"))
      .groupBy("doc_id").agg(sum(col("bit") + col("guard")).as("ahash"))
  }

  /**
   * Perceptual near-dup pairs over the payload column — the image-dedup
   * step of a multimodal curation stack: [[aHash]] fingerprints, banded
   * LSH candidates (hamming ≤ maxHamming ⇒ pigeonhole: some band of
   * bands = maxHamming+1 is EQUAL, so candidate generation is an
   * equi-join on (band, key) — never an all-pairs scan), then the exact
   * `bit_count(xor)` verify on candidates only. Same sub-quadratic
   * shape as the SimHash text family; only the fingerprint source
   * differs (payload spans, not token shingles). Returns
   * (id_a, id_b, hamming) for verified pairs.
   */
  def aHashPairs(media: DataFrame, k: Int = 48, maxHamming: Int = 2)(
      implicit spark: SparkSession): DataFrame = {
    val bands = maxHamming + 1
    val bandBits = k / bands
    require(bandBits >= 1, s"need >= 1 bit per band ($bands bands over $k bits)")
    // the LAST band takes the remainder bits — every bit must live in
    // SOME band or the pigeonhole guarantee silently breaks (a pair
    // differing only in uncovered bits would never become a candidate)
    val widthOf = (b: Int) => if (b == bands - 1) k - b * bandBits else bandBits
    val h = aHash(media, k)
    val banded = h.select(col("doc_id"), col("ahash"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          expr(s"(ahash >> ${b * bandBits}) & ${(1L << widthOf(b)) - 1}")
            .as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("ahash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        expr("bit_count(a.ahash ^ b.ahash)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
