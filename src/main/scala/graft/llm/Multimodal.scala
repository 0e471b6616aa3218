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
 * Decode (round 20): payloads that ARE a real public image format —
 * binary Netpbm P6 (portable pixmap; format spec is public knowledge,
 * the parser below is ~50 lines with zero dependencies) — decode for
 * real: [[P6Decoder]] validates the header (magic, `#` comments,
 * arbitrary header whitespace, maxval, exact raster length) and every
 * downstream op ([[extractFeatures]], [[sampleFrames]], [[resize]], and
 * therefore [[aHash]]/[[aHashPairs]]) runs over the DECODED PIXEL
 * CHANNELS, so two different encodings of the same image (re-ordered
 * header whitespace, added comments) produce IDENTICAL features and
 * hashes — the property a perceptual near-dup pipeline exists for, and
 * one no byte-level stub can have.
 *
 * Payloads in any OTHER format still route to [[StubDecoder]], a
 * deterministic fake that derives features from the raw bytes — the
 * container has no JPEG/audio codecs, and the fallback keeps the
 * plumbing testable on arbitrary binaries. Swapping the stub for a
 * JNI/FFI codec changes nothing structurally.
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

  /**
   * Binary Netpbm P6 parser (portable pixmap, the `P6` rawbits variant):
   * `P6 <ws> width <ws> height <ws> maxval <one ws byte> raster`, where
   * `<ws>` is any run of whitespace and `#`-to-newline comments, and the
   * raster is exactly width·height·3 single-byte RGB samples (maxval ≤
   * 255). Validation is STRUCTURAL and total — magic, positive dims,
   * maxval ∈ [1,255], exactly one whitespace byte after maxval, raster
   * length exact — so routing on `parse(...).isDefined` cannot
   * misclassify a non-P6 binary (a text payload would need the full
   * header grammar AND a byte-exact raster length to false-positive).
   */
  object P6Decoder {
    /** width, height, maxval, byte offset where the raster starts. */
    final case class Header(width: Int, height: Int, maxval: Int, pixelOffset: Int)

    def parse(p: Array[Byte]): Option[Header] = {
      if (p == null || p.length < 4 || p(0) != 'P' || p(1) != '6') return None
      var i = 2
      def isWs(b: Byte): Boolean =
        b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0x0b
      // header whitespace: ≥1 whitespace byte or #-comment (to newline)
      def skipWs(): Boolean = {
        var seen = false
        var go = true
        while (go && i < p.length) {
          if (isWs(p(i))) { seen = true; i += 1 }
          else if (p(i) == '#') {
            seen = true
            while (i < p.length && p(i) != '\n') i += 1
          } else go = false
        }
        seen
      }
      // unsigned decimal, ≤ 9 digits (a 10th digit means a dimension no
      // real image has and a value that could overflow — parse failure)
      def int(): Int = {
        var v = 0
        var digits = 0
        while (i < p.length && p(i) >= '0' && p(i) <= '9') {
          if (digits == 9) return -1
          v = v * 10 + (p(i) - '0')
          digits += 1
          i += 1
        }
        if (digits == 0) -1 else v
      }
      if (!skipWs()) return None
      val w = int(); if (w < 1) return None
      if (!skipWs()) return None
      val h = int(); if (h < 1) return None
      if (!skipWs()) return None
      val mv = int(); if (mv < 1 || mv > 255) return None
      // the spec's raster delimiter: EXACTLY one whitespace byte (a
      // comment here would eat raster bytes on images starting with '#')
      if (i >= p.length || !isWs(p(i))) return None
      i += 1
      if (p.length.toLong - i != w.toLong * h * 3) return None
      Some(Header(w, h, mv, i))
    }

    /** The plane every downstream op consumes: decoded RGB channel bytes
      * for a valid P6 or 24-bit BMP payload, the raw payload bytes
      * otherwise (stub semantics, unchanged for other binaries). Both
      * decoders normalize to the SAME canonical plane — row-major
      * top-down RGB — so two encodings of one image hash identically
      * even ACROSS formats (a P6 and a BMP of the same pixels are
      * perceptual clones, which is the property an image-dedup pipeline
      * actually needs). */
    def pixelPlane(payload: Array[Byte]): Array[Byte] =
      parse(payload) match {
        case Some(hd) =>
          java.util.Arrays.copyOfRange(payload, hd.pixelOffset, payload.length)
        case None => BmpDecoder.pixelPlane(payload)
      }
  }

  /**
   * Uncompressed 24-bit Windows BMP parser (BITMAPFILEHEADER +
   * 40-byte BITMAPINFOHEADER — the classic public format; all fields
   * little-endian). Structural validation is total, as for
   * [[P6Decoder]]: `BM` magic, header sizes, planes = 1, bpp = 24,
   * compression = 0, and the payload length must EXACTLY equal
   * dataOffset + rowStride·|height| (rows padded to 4 bytes), so a
   * non-BMP binary cannot false-positive. Decoding normalizes the
   * storage quirks away: bottom-up (positive height) or top-down
   * (negative) row order, per-row padding, and BGR channel order all
   * collapse to the canonical row-major top-down RGB plane.
   */
  object BmpDecoder {
    final case class Header(width: Int, height: Int, topDown: Boolean,
        dataOffset: Int)

    private def u16(p: Array[Byte], i: Int): Int =
      (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    private def i32(p: Array[Byte], i: Int): Int =
      (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
        ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)

    def parse(p: Array[Byte]): Option[Header] = {
      if (p == null || p.length < 54 || p(0) != 'B' || p(1) != 'M') return None
      val dataOffset = i32(p, 10)
      if (i32(p, 14) != 40) return None // BITMAPINFOHEADER only
      val w = i32(p, 18)
      val hRaw = i32(p, 22)
      if (w < 1 || hRaw == 0 || hRaw == Int.MinValue) return None
      if (u16(p, 26) != 1 || u16(p, 28) != 24) return None
      if (i32(p, 30) != 0) return None // BI_RGB (uncompressed)
      val h = math.abs(hRaw)
      val stride = ((w * 3 + 3) / 4) * 4
      if (dataOffset < 54 || stride.toLong * h > Int.MaxValue) return None
      if (p.length.toLong != dataOffset.toLong + stride.toLong * h) return None
      Some(Header(w, h, topDown = hRaw < 0, dataOffset))
    }

    /** Canonical plane (top-down row-major RGB) for a valid 24-bit BMP;
      * the raw payload otherwise. */
    def pixelPlane(payload: Array[Byte]): Array[Byte] =
      parse(payload) match {
        case Some(hd) =>
          val stride = ((hd.width * 3 + 3) / 4) * 4
          val out = new Array[Byte](hd.width * hd.height * 3)
          var row = 0
          while (row < hd.height) {
            val srcRow = if (hd.topDown) row else hd.height - 1 - row
            val base = hd.dataOffset + srcRow * stride
            var x = 0
            while (x < hd.width) {
              // BGR on disk → RGB in the plane
              out((row * hd.width + x) * 3) = payload(base + x * 3 + 2)
              out((row * hd.width + x) * 3 + 1) = payload(base + x * 3 + 1)
              out((row * hd.width + x) * 3 + 2) = payload(base + x * 3)
              x += 1
            }
            row += 1
          }
          out
        case None => WavDecoder.pixelPlane(payload)
      }
  }

  /**
   * RIFF/WAVE PCM parser — the AUDIO modality's real decoder (the format
   * is public knowledge: `RIFF <size> WAVE` then even-padded chunks;
   * `fmt ` must declare PCM (audioFormat 1) at 8 or 16 bits; `data`
   * carries the samples). Structural validation is total, as for the
   * image decoders: chunk sizes must walk the payload EXACTLY (no
   * trailing bytes), `fmt ` must precede `data`, and the data size must
   * be a multiple of the sample frame size — a non-WAV binary cannot
   * false-positive.
   *
   * The decoded plane is one UNSIGNED byte per sample per channel —
   * 8-bit PCM verbatim (it is already unsigned), 16-bit PCM reduced to
   * its high byte rebased to unsigned ((s >> 8) + 128): deterministic,
   * order-preserving, and the same 0..255 domain the image planes use,
   * so every downstream op (frame sampling = audio sampling, resize =
   * downsample, aHash = acoustic fingerprint shape) composes unchanged.
   */
  object WavDecoder {
    final case class Header(channels: Int, sampleRate: Int, bits: Int,
        dataOffset: Int, dataLen: Int)

    private def u16(p: Array[Byte], i: Int): Int =
      (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    private def i32(p: Array[Byte], i: Int): Int =
      (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
        ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)
    private def tag(p: Array[Byte], i: Int, t: String): Boolean =
      p(i) == t(0).toByte && p(i + 1) == t(1).toByte &&
        p(i + 2) == t(2).toByte && p(i + 3) == t(3).toByte

    def parse(p: Array[Byte]): Option[Header] = {
      if (p == null || p.length < 44) return None
      if (!tag(p, 0, "RIFF") || !tag(p, 8, "WAVE")) return None
      if (i32(p, 4) != p.length - 8) return None
      var i = 12
      var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
      var data: Option[(Int, Int)] = None // offset, len
      while (i + 8 <= p.length) {
        val size = i32(p, i + 4)
        if (size < 0 || i + 8 + size > p.length) return None
        if (tag(p, i, "fmt ")) {
          if (size < 16 || data.nonEmpty) return None // fmt before data
          if (u16(p, i + 8) != 1) return None // PCM only
          val ch = u16(p, i + 10)
          val rate = i32(p, i + 12)
          val bits = u16(p, i + 22)
          if (ch < 1 || rate < 1 || (bits != 8 && bits != 16)) return None
          fmt = Some((ch, rate, bits))
        } else if (tag(p, i, "data")) {
          if (fmt.isEmpty || data.nonEmpty) return None
          data = Some((i + 8, size))
        }
        i += 8 + size + (size & 1) // chunks are even-padded
      }
      if (i != p.length) return None // chunk walk must land exactly
      for {
        (ch, rate, bits) <- fmt
        (off, len) <- data
        if len % (ch * bits / 8) == 0
      } yield Header(ch, rate, bits, off, len)
    }

    /** Canonical plane (one unsigned byte per sample per channel) for a
      * valid PCM WAV; the raw payload otherwise. */
    def pixelPlane(payload: Array[Byte]): Array[Byte] =
      parse(payload) match {
        case Some(hd) if hd.bits == 8 =>
          java.util.Arrays.copyOfRange(payload, hd.dataOffset,
            hd.dataOffset + hd.dataLen)
        case Some(hd) => // 16-bit LE: high byte, rebased to unsigned
          val n = hd.dataLen / 2
          val out = new Array[Byte](n)
          var j = 0
          while (j < n) {
            out(j) = ((payload(hd.dataOffset + j * 2 + 1) + 128) & 0xff).toByte
            j += 1
          }
          out
        case None => if (payload == null) Array.emptyByteArray else payload
      }
  }

  /**
   * Uncompressed AVI parser — the VIDEO modality's real decoder. The
   * container is public RIFF structure: `RIFF('AVI ' LIST('hdrl' avih
   * LIST('strl' strh strf)) LIST('movi' '00db'…))`, one 'vids' stream
   * whose strf is the same 40-byte BITMAPINFOHEADER BMP uses and whose
   * '00db' chunks carry raw DIB frame bits (bottom-up BGR rows, 4-byte
   * padding — decoded with the same normalization as [[BmpDecoder]]).
   * Validation is total: the chunk walk must land exactly at the payload
   * end, avih's stream count must be 1, strf geometry must match avih,
   * every frame chunk must be exactly stride·height bytes, and the
   * frame count must equal avih's dwTotalFrames.
   */
  object AviDecoder {
    final case class Avi(width: Int, height: Int, frameOffsets: Vector[Int])

    private def i32(p: Array[Byte], i: Int): Int =
      (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
        ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)
    private def u16(p: Array[Byte], i: Int): Int =
      (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    private def tag(p: Array[Byte], i: Int, t: String): Boolean =
      i + 4 <= p.length && p(i) == t(0).toByte && p(i + 1) == t(1).toByte &&
        p(i + 2) == t(2).toByte && p(i + 3) == t(3).toByte

    def stride(w: Int): Int = ((w * 3 + 3) / 4) * 4

    def parse(p: Array[Byte]): Option[Avi] = {
      if (p == null || p.length < 12) return None
      if (!tag(p, 0, "RIFF") || i32(p, 4) != p.length - 8 ||
        !tag(p, 8, "AVI ")) return None
      var i = 12
      var dims: Option[(Int, Int, Int)] = None // w, h, totalFrames
      var strfOk = false
      var frames = Vector.newBuilder[Int]
      var nFrames = 0
      var sawMovi = false
      while (i + 8 <= p.length) {
        val size = i32(p, i + 4)
        if (size < 0 || i + 8 + size > p.length) return None
        if (tag(p, i, "LIST") && size >= 4) {
          if (tag(p, i + 8, "hdrl")) {
            // walk hdrl's children for avih and the strl list
            var j = i + 12
            val end = i + 8 + size
            while (j + 8 <= end) {
              val sz = i32(p, j + 4)
              if (sz < 0 || j + 8 + sz > end) return None
              if (tag(p, j, "avih")) {
                if (sz < 56 || dims.nonEmpty) return None
                if (i32(p, j + 8 + 24) != 1) return None // one stream
                val w = i32(p, j + 8 + 32)
                val h = i32(p, j + 8 + 36)
                val tf = i32(p, j + 8 + 16)
                if (w < 1 || h < 1 || tf < 1) return None
                dims = Some((w, h, tf))
              } else if (tag(p, j, "LIST") && sz >= 4 &&
                  tag(p, j + 8, "strl")) {
                var k = j + 12
                val e2 = j + 8 + sz
                while (k + 8 <= e2) {
                  val s2 = i32(p, k + 4)
                  if (s2 < 0 || k + 8 + s2 > e2) return None
                  if (tag(p, k, "strh")) {
                    if (!tag(p, k + 8, "vids")) return None
                  } else if (tag(p, k, "strf")) {
                    // BITMAPINFOHEADER matching avih's geometry
                    val d = dims.getOrElse(return None)
                    if (s2 < 40 || i32(p, k + 8) != 40) return None
                    if (i32(p, k + 12) != d._1 ||
                      i32(p, k + 16) != d._2) return None
                    if (u16(p, k + 20) != 1 || u16(p, k + 22) != 24)
                      return None
                    if (i32(p, k + 24) != 0) return None
                    strfOk = true
                  }
                  k += 8 + s2 + (s2 & 1)
                }
              }
              j += 8 + sz + (sz & 1)
            }
          } else if (tag(p, i + 8, "movi")) {
            if (sawMovi) return None
            sawMovi = true
            val d = dims.getOrElse(return None)
            if (!strfOk) return None
            val frameBytes = stride(d._1) * d._2
            var j = i + 12
            val end = i + 8 + size
            while (j + 8 <= end) {
              val sz = i32(p, j + 4)
              if (!tag(p, j, "00db") || sz != frameBytes ||
                j + 8 + sz > end) return None
              frames += (j + 8)
              nFrames += 1
              j += 8 + sz + (sz & 1)
            }
            if (j != end) return None
          }
        }
        i += 8 + size + (size & 1)
      }
      if (i != p.length) return None
      dims match {
        case Some((w, h, tf)) if strfOk && sawMovi && nFrames == tf =>
          Some(Avi(w, h, frames.result()))
        case _ => None
      }
    }

    /** One frame's canonical plane (top-down row-major RGB) from its
      * raw DIB bits (bottom-up BGR, padded rows). */
    def framePlane(p: Array[Byte], avi: Avi, frame: Int): Array[Byte] = {
      val st = stride(avi.width)
      val out = new Array[Byte](avi.width * avi.height * 3)
      val off = avi.frameOffsets(frame)
      var row = 0
      while (row < avi.height) {
        val base = off + (avi.height - 1 - row) * st
        var x = 0
        while (x < avi.width) {
          out((row * avi.width + x) * 3) = p(base + x * 3 + 2)
          out((row * avi.width + x) * 3 + 1) = p(base + x * 3 + 1)
          out((row * avi.width + x) * 3 + 2) = p(base + x * 3)
          x += 1
        }
        row += 1
      }
      out
    }

    /** Mod-997 byte-sum fingerprint of one decoded frame — the exact
      * integer a DuckDB oracle can rebuild from the fixture formula. */
    def frameFingerprint(p: Array[Byte], avi: Avi, frame: Int): Int = {
      val plane = framePlane(p, avi, frame)
      var s = 0L
      var i = 0
      while (i < plane.length) { s += plane(i) & 0xff; i += 1 }
      (s % 997).toInt
    }

    /** The whole clip's canonical plane: frames concatenated in temporal
      * order — so resize/aHash over a video payload fingerprint the CLIP. */
    def pixelPlane(payload: Array[Byte]): Array[Byte] =
      parse(payload) match {
        case Some(avi) =>
          val fp = avi.width * avi.height * 3
          val out = new Array[Byte](fp * avi.frameOffsets.length)
          var f = 0
          while (f < avi.frameOffsets.length) {
            System.arraycopy(framePlane(payload, avi, f), 0, out, f * fp, fp)
            f += 1
          }
          out
        case None => AviDecoder.pixelPlane(payload)
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
   * Deterministic REAL P6 image fixtures from the documents table — the
   * decode-path test corpus. Image d is `(4 + d%5) × (3 + d%4)` pixels
   * with channel sample j = `(d·31 + j·7) mod 251` — pure integer
   * arithmetic on doc_id, so a DuckDB oracle rebuilds the exact pixels
   * WITHOUT parsing any bytes, and a hash match proves the Spark side
   * really decoded the raster out of the encoded payload.
   *
   * `reencoded = true` emits the SAME image in a different valid P6
   * encoding (comment lines, re-ordered header whitespace, space instead
   * of newline as the raster delimiter): byte-distinct payloads, pixel-
   * identical content — the clone pair every perceptual-hash test needs.
   */
  def p6FromDocuments(docs: DataFrame, reencoded: Boolean = false)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val variant = reencoded
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { d =>
        val w = (4 + d % 5).toInt
        val h = (3 + d % 4).toInt
        val header =
          if (!variant) s"P6\n$w $h\n255\n"
          else s"P6\n# graft re-encode of $d\n  $w\t$h\n# maxval next\n255 "
        val hb = header.getBytes("US-ASCII")
        val out = new Array[Byte](hb.length + w * h * 3)
        System.arraycopy(hb, 0, out, 0, hb.length)
        var j = 0
        val n = w * h * 3
        while (j < n) {
          out(hb.length + j) = ((d * 31 + j * 7) % 251).toByte
          j += 1
        }
        (d, out)
      })
      .toDF("doc_id", "payload")
      .withColumn("mime", lit("image/x-portable-pixmap"))
  }

  /** Decode one payload: REAL decode for P6 (width/height from the
    * header, n_bytes/mean over the decoded channel samples), stub
    * statistics for everything else. */
  def decode(docId: Long, payload: Array[Byte]): MediaFeatures =
    P6Decoder.parse(payload) match {
      case Some(hd) =>
        val n = payload.length - hd.pixelOffset
        var sum = 0L
        var i = hd.pixelOffset
        while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
        MediaFeatures(
          doc_id = docId,
          n_bytes = n.toLong,
          mean_byte = if (n == 0) 0.0 else sum.toDouble / n,
          width = hd.width,
          height = hd.height)
      case None => BmpDecoder.parse(payload) match {
        case Some(hd) =>
          val plane = BmpDecoder.pixelPlane(payload)
          var sum = 0L
          var i = 0
          while (i < plane.length) { sum += plane(i) & 0xff; i += 1 }
          MediaFeatures(
            doc_id = docId,
            n_bytes = plane.length.toLong,
            mean_byte = if (plane.length == 0) 0.0
              else sum.toDouble / plane.length,
            width = hd.width,
            height = hd.height)
        case None => WavDecoder.parse(payload) match {
          case Some(hd) =>
            val plane = WavDecoder.pixelPlane(payload)
            var sum = 0L
            var i = 0
            while (i < plane.length) { sum += plane(i) & 0xff; i += 1 }
            // audio has no width/height: report the two decode-relevant
            // geometry facts instead — channels and bits per sample
            MediaFeatures(
              doc_id = docId,
              n_bytes = plane.length.toLong,
              mean_byte = if (plane.length == 0) 0.0
                else sum.toDouble / plane.length,
              width = hd.channels,
              height = hd.bits)
          case None => AviDecoder.parse(payload) match {
            case Some(avi) =>
              val plane = AviDecoder.pixelPlane(payload)
              var sum = 0L
              var i = 0
              while (i < plane.length) { sum += plane(i) & 0xff; i += 1 }
              MediaFeatures(
                doc_id = docId,
                n_bytes = plane.length.toLong,
                mean_byte = if (plane.length == 0) 0.0
                  else sum.toDouble / plane.length,
                width = avi.width,
                height = avi.height)
            case None =>
              StubDecoder.decode(docId,
                if (payload == null) Array.emptyByteArray else payload)
          }
        }
      }
    }

  /**
   * The SAME images as [[p6FromDocuments]], encoded as uncompressed
   * 24-bit BMPs (bottom-up rows, per-row 4-byte padding, BGR channel
   * order — every storage quirk the decoder must normalize away).
   * Channel sample j of the canonical row-major top-down RGB stream is
   * the same `(d·31 + j·7) mod 251`, so a P6 and a BMP of one doc_id
   * are byte-DISTINCT payloads of pixel-IDENTICAL images: the
   * cross-format clone pair.
   */
  def bmpFromDocuments(docs: DataFrame)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { d =>
        val w = (4 + d % 5).toInt
        val h = (3 + d % 4).toInt
        val stride = ((w * 3 + 3) / 4) * 4
        val dataOffset = 54
        val size = dataOffset + stride * h
        val out = new Array[Byte](size)
        def put16(i: Int, v: Int): Unit = {
          out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
        }
        def put32(i: Int, v: Int): Unit = {
          out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
          out(i + 2) = (v >>> 16).toByte; out(i + 3) = (v >>> 24).toByte
        }
        out(0) = 'B'; out(1) = 'M'
        put32(2, size); put32(6, 0); put32(10, dataOffset)
        put32(14, 40); put32(18, w); put32(22, h) // positive = bottom-up
        put16(26, 1); put16(28, 24); put32(30, 0); put32(34, stride * h)
        put32(38, 2835); put32(42, 2835); put32(46, 0); put32(50, 0)
        def v(j: Int): Byte = ((d * 31 + j * 7) % 251).toByte
        var row = 0
        while (row < h) {
          var x = 0
          while (x < w) {
            val base = dataOffset + (h - 1 - row) * stride + x * 3
            val j = (row * w + x) * 3
            out(base) = v(j + 2)     // B
            out(base + 1) = v(j + 1) // G
            out(base + 2) = v(j)     // R
            x += 1
          }
          row += 1
        }
        (d, out)
      })
      .toDF("doc_id", "payload")
      .withColumn("mime", lit("image/bmp"))
  }

  /**
   * The SAME sample stream as the image fixtures, encoded as an 8-bit
   * PCM mono RIFF/WAVE payload: sample j = `(d·31 + j·7) mod 251` over
   * n = w·h·3 samples — so a WAV, a P6 and a BMP of one doc_id decode
   * to the IDENTICAL canonical plane (byte-distinct payloads in three
   * different public formats). Odd sample counts exercise RIFF's
   * even-chunk padding rule.
   */
  def wavFromDocuments(docs: DataFrame)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { d =>
        val n = ((4 + d % 5) * (3 + d % 4) * 3).toInt
        val pad = n & 1
        val out = new Array[Byte](44 + n + pad)
        def tag(i: Int, t: String): Unit =
          (0 until 4).foreach(k => out(i + k) = t(k).toByte)
        def put16(i: Int, v: Int): Unit = {
          out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
        }
        def put32(i: Int, v: Int): Unit = {
          out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
          out(i + 2) = (v >>> 16).toByte; out(i + 3) = (v >>> 24).toByte
        }
        tag(0, "RIFF"); put32(4, 36 + n + pad); tag(8, "WAVE")
        tag(12, "fmt "); put32(16, 16)
        put16(20, 1)      // PCM
        put16(22, 1)      // mono
        put32(24, 8000)   // sample rate
        put32(28, 8000)   // byte rate
        put16(32, 1)      // block align
        put16(34, 8)      // bits per sample
        tag(36, "data"); put32(40, n)
        var j = 0
        while (j < n) {
          out(44 + j) = ((d * 31 + j * 7) % 251).toByte
          j += 1
        }
        (d, out)
      })
      .toDF("doc_id", "payload")
      .withColumn("mime", lit("audio/wav"))
  }

  /**
   * Deterministic uncompressed-AVI fixtures: doc d is a clip of
   * `2 + d%3` frames at the image fixtures' `w × h` geometry; channel
   * sample j of frame f's canonical RGB stream is
   * `(d·31 + f·101 + j·7) mod 251` — integer arithmetic a DuckDB oracle
   * rebuilds without parsing a container. Frames are stored as real DIB
   * bits (bottom-up BGR, padded rows) inside the full RIFF structure
   * ([[AviDecoder]]'s layout), so the parser exercises the whole walk.
   */
  def aviFromDocuments(docs: DataFrame)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { d =>
        val w = (4 + d % 5).toInt
        val h = (3 + d % 4).toInt
        val nF = (2 + d % 3).toInt
        val st = AviDecoder.stride(w)
        val frameBytes = st * h
        // sizes: every chunk here is even (stride is a multiple of 4)
        val strlSize = 4 + 8 + 56 + 8 + 40
        val hdrlSize = 4 + 8 + 56 + 8 + strlSize
        val moviSize = 4 + nF * (8 + frameBytes)
        val total = 12 + 8 + hdrlSize + 8 + moviSize
        val out = new Array[Byte](total)
        var o = 0
        def tag(t: String): Unit = {
          (0 until 4).foreach(i => out(o + i) = t(i).toByte); o += 4
        }
        def p16(v: Int): Unit = {
          out(o) = v.toByte; out(o + 1) = (v >>> 8).toByte; o += 2
        }
        def p32(v: Int): Unit = {
          out(o) = v.toByte; out(o + 1) = (v >>> 8).toByte
          out(o + 2) = (v >>> 16).toByte; out(o + 3) = (v >>> 24).toByte
          o += 4
        }
        tag("RIFF"); p32(total - 8); tag("AVI ")
        tag("LIST"); p32(hdrlSize); tag("hdrl")
        tag("avih"); p32(56)
        p32(40000); p32(frameBytes * 25); p32(0); p32(0) // usec/frame…
        p32(nF); p32(0); p32(1); p32(frameBytes)         // totalFrames, streams=1
        p32(w); p32(h); p32(0); p32(0); p32(0); p32(0)
        tag("LIST"); p32(strlSize); tag("strl")
        tag("strh"); p32(56)
        tag("vids"); tag("DIB ")
        p32(0); p16(0); p16(0); p32(0); p32(1); p32(25)  // scale/rate
        p32(0); p32(nF); p32(frameBytes); p32(-1); p32(0)
        p16(0); p16(0); p16(0); p16(0)
        tag("strf"); p32(40)
        p32(40); p32(w); p32(h); p16(1); p16(24); p32(0)
        p32(frameBytes); p32(2835); p32(2835); p32(0); p32(0)
        tag("LIST"); p32(moviSize); tag("movi")
        def v(f: Int, j: Int): Byte = ((d * 31 + f * 101 + j * 7) % 251).toByte
        var f = 0
        while (f < nF) {
          tag("00db"); p32(frameBytes)
          var row = 0
          while (row < h) {
            var x = 0
            while (x < w) {
              val base = o + (h - 1 - row) * st + x * 3
              val j = (row * w + x) * 3
              out(base) = v(f, j + 2)
              out(base + 1) = v(f, j + 1)
              out(base + 2) = v(f, j)
              x += 1
            }
            row += 1
          }
          o += frameBytes
          f += 1
        }
        (d, out)
      })
      .toDF("doc_id", "payload")
      .withColumn("mime", lit("video/avi"))
  }

  /**
   * FORMAT NORMALIZATION — the ETL step a heterogeneous multimodal
   * corpus needs before storage dedup: every payload whose decoder
   * yields 2D pixel geometry (P6 or 24-bit BMP) is re-encoded as the
   * CANONICAL P6 byte stream (`P6\n<w> <h>\n255\n` + top-down RGB
   * raster — one byte stream per image, whatever it arrived as), so
   * byte-level exact dedup downstream collapses cross-format and
   * re-encoded copies without any perceptual hashing. Non-image
   * payloads (audio, video containers, unknown binaries) pass through
   * unchanged with `transcoded = false` — normalizing them to a still
   * image would destroy information, and the caller can route on the
   * flag. Deterministic: the canonical encoding of an image is unique,
   * so `transcode ∘ transcode = transcode` (idempotent, spec-pinned).
   */
  def transcodeToP6(media: DataFrame)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, raw) =>
        val geom: Option[(Int, Int)] = P6Decoder.parse(raw)
          .map(h => (h.width, h.height))
          .orElse(BmpDecoder.parse(raw).map(h => (h.width, h.height)))
        geom match {
          case Some((w, h)) =>
            val plane = P6Decoder.pixelPlane(raw) // P6 raster or BMP plane
            val hdr = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
            val out = new Array[Byte](hdr.length + plane.length)
            System.arraycopy(hdr, 0, out, 0, hdr.length)
            System.arraycopy(plane, 0, out, hdr.length, plane.length)
            (id, out, true)
          case None => (id, raw, false)
        }
      })
      .toDF("doc_id", "payload", "transcoded")
      .withColumn("mime",
        when(col("transcoded"), lit("image/x-portable-pixmap"))
          .otherwise(lit("application/octet-stream")))
  }

  /**
   * Partition-wise feature extraction — the `mapInPandas` analog. Each
   * task iterates its partition once through the decoder ([[P6Decoder]]
   * for real P6 images, [[StubDecoder]] otherwise); the output is a
   * typed Dataset whose schema downstream SQL composes with.
   */
  def extractFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decode(id, bytes) })
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
        AviDecoder.parse(raw) match {
          case Some(avi) if avi.frameOffsets.nonEmpty =>
            // a REAL video container samples REAL frames: k evenly-
            // spaced frames decoded from their DIB bits, each reported
            // as its exact mod-997 plane fingerprint
            (0 until k).iterator.map { i =>
              val f = (i * avi.frameOffsets.length) / k
              FrameSample(id, i, AviDecoder.frameFingerprint(raw, avi, f))
            }
          case _ =>
            // flat media: k evenly-spaced samples of the DECODED plane
            // (pixel channels for images, PCM bytes for audio, raw
            // bytes for unknown formats) — re-encoding must not move
            // frames
            val bytes = P6Decoder.pixelPlane(raw)
            val n = bytes.length
            if (n == 0) Iterator.empty
            else (0 until k).iterator.map { i =>
              FrameSample(id, i, bytes((i * n) / k) & 0xff)
            }
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
        // spans cover the DECODED plane (see sampleFrames) — so aHash,
        // which is built from these spans, is an invariant of the IMAGE,
        // not of its header formatting
        val bytes = P6Decoder.pixelPlane(raw)
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
