package graft.northstar

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (BASELINE.json
  * north-star).
  *
  * Media are opaque `binary` payloads with a typed metadata struct; the
  * Spark-side plumbing — schema, partition-friendly batch iteration, typed
  * encoders, frame slicing — is real and tested. Image dimensions are
  * parsed for real from PNG/JPEG container headers in pure JVM code
  * ([[Multimodal.MediaDecoder.ContainerHeaders]]); full pixel/sample decode
  * remains behind the same pluggable [[Multimodal.MediaDecoder]] seam
  * (this container ships no codec libraries — a deployment binds one
  * there; [[Multimodal.MediaDecoder.Fake]] is the deterministic test
  * double).
  *
  * Scale notes: payload processing is `mapPartitions` over an iterator
  * (the genuinely imperative case — per-row codec calls), so it streams
  * batch-wise per partition with no driver involvement; everything before
  * and after stays columnar.
  */
object Multimodal {

  final case class MediaMeta(kind: String, width: Int, height: Int,
      sample_rate: Int, duration_ms: Long)
  final case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      byte_histogram: Array[Long], checksum: Long,
      width: Option[Int], height: Option[Int],
      sample_rate: Option[Int], channels: Option[Int])

  final case class AudioFormat(sample_rate: Int, channels: Int,
      bits_per_sample: Int)

  /** The pluggable decode seam: a real deployment binds a codec library
    * here; the Spark plumbing (typed mapPartitions, schema, batch shape)
    * is identical for every implementation. Must be Serializable — it
    * ships to executors inside the mapPartitions closure.
    */
  trait MediaDecoder extends Serializable {
    /** (width, height) if the payload is a recognized image container. */
    def dimensions(payload: Array[Byte]): Option[(Int, Int)]
    /** Sample format if the payload is a recognized audio container. */
    def audioFormat(payload: Array[Byte]): Option[AudioFormat] = None
  }

  object MediaDecoder {

    /** Pure-JVM container-header parse — REAL metadata from real bytes,
      * no codec library needed: PNG's IHDR chunk (width/height at fixed
      * offsets 16/20 per the PNG spec, RFC 2083 §3.1), JPEG's SOFn
      * marker segment (height/width big-endian after precision, ITU T.81
      * §B.2.2) found by walking the marker stream, and WAV's `fmt ` chunk
      * (channels/sample-rate/bits little-endian, RIFF/WAVE per the
      * Microsoft/IBM WAVE spec) found by walking the RIFF chunk list.
      */
    object ContainerHeaders extends MediaDecoder {
      override def dimensions(b: Array[Byte]): Option[(Int, Int)] =
        png(b).orElse(jpeg(b))

      override def audioFormat(b: Array[Byte]): Option[AudioFormat] = {
        // RIFF<size>WAVE then a chunk walk: id(4) size(4,LE) payload
        if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
          b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
          b(11) != 'E') return None
        var i = 12
        while (i + 8 <= b.length) {
          val size = le32(b, i + 4)
          if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' &&
            b(i + 3) == ' ') {
            // fmt: format(2) channels(2) sampleRate(4) byteRate(4)
            //      blockAlign(2) bitsPerSample(2) — all little-endian
            return if (size >= 16 && i + 8 + 16 <= b.length)
              Some(AudioFormat(le32(b, i + 12), le16(b, i + 10),
                le16(b, i + 22)))
            else None
          }
          // corrupt sizes: negative would loop forever, near-Int.MaxValue
          // would overflow `i` negative and index out of bounds — any
          // chunk claiming more than the remaining bytes is rejected
          if (size < 0 || size > b.length - i - 8) return None
          i += 8 + size + (size & 1) // RIFF chunks are word-aligned
        }
        None
      }

      private def le16(b: Array[Byte], i: Int): Int =
        (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      private def le32(b: Array[Byte], i: Int): Int =
        (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
          ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

      private def be16(b: Array[Byte], i: Int): Int =
        ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
      private def be32(b: Array[Byte], i: Int): Int =
        ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
          ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

      private val PngSig =
        Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

      private def png(b: Array[Byte]): Option[(Int, Int)] =
        if (b.length >= 24 && b.startsWith(PngSig) &&
          b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
          Some((be32(b, 16), be32(b, 20)))
        else None

      private def jpeg(b: Array[Byte]): Option[(Int, Int)] = {
        if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
          return None
        var i = 2
        while (i + 3 < b.length) {
          if ((b(i) & 0xff) != 0xff) return None // desynced marker stream
          val marker = b(i + 1) & 0xff
          if (marker == 0xff) i += 1 // fill byte
          else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8))
            i += 2 // standalone markers carry no length
          else if ((marker >= 0xc0 && marker <= 0xcf) &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
            // SOFn: len(2) precision(1) height(2) width(2)
            return if (i + 8 < b.length) Some((be16(b, i + 7), be16(b, i + 5)))
            else None
          } else i += 2 + be16(b, i + 2) // skip the segment
        }
        None
      }
    }

    /** Deterministic test double standing in for a full codec — the role
      * the r1 `fakeDecode` played, now behind the same seam production
      * binds to.
      */
    object Fake extends MediaDecoder {
      override def dimensions(payload: Array[Byte]): Option[(Int, Int)] =
        Some((payload.length % 512, payload.length % 384))
    }
  }

  /** Synthesize a media table from any (id, text) source — deterministic
    * fake payloads (UTF-8 bytes) with metadata, standing in for real decoded
    * uploads. Partitioned by kind for partition-pruned scans.
    */
  def packFromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      to_binary(col(textCol), lit("utf-8")).as("payload"),
      struct(
        element_at(typedLit(Seq("image", "audio", "video")),
          (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
        lit(64).as("width"), lit(64).as("height"),
        lit(16000).as("sample_rate"),
        (length(col(textCol)) * 10L).as("duration_ms")).as("meta"))
      .as[MediaRow]
  }

  /** Feature extraction over payload bytes. Byte statistics (histogram +
    * rolling checksum) are computed inline; image dimensions come from the
    * pluggable `decoder` — [[MediaDecoder.ContainerHeaders]] reads real
    * PNG/JPEG headers, [[MediaDecoder.Fake]] is the deterministic test
    * double, and a production deployment binds a full codec at the same
    * seam. Full pixel/sample statistics stay out of scope in this container
    * (no codec libraries) — that remaining stub IS the decoder seam.
    */
  def extractFeatures(media: Dataset[MediaRow],
      decoder: MediaDecoder = MediaDecoder.ContainerHeaders): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val hist = new Array[Long](16)
        var checksum = 1125899906842597L
        var i = 0
        while (i < r.payload.length) {
          hist((r.payload(i) & 0xff) >> 4) += 1
          checksum = checksum * 31 + (r.payload(i) & 0xff)
          i += 1
        }
        val dims = decoder.dimensions(r.payload)
        val audio = decoder.audioFormat(r.payload)
        MediaFeatures(r.media_id, r.meta.kind, r.payload.length, hist, checksum,
          dims.map(_._1), dims.map(_._2),
          audio.map(_.sample_rate), audio.map(_.channels))
      }
    }
  }

  /** Frame sampling: slice `n` evenly-spaced fixed-width byte windows from
    * the payload (the video-keyframe access pattern) — pure Column algebra,
    * no decode needed for the slicing itself.
    */
  def sampleFrames(media: DataFrame, n: Int, frameBytes: Int): DataFrame = {
    // sequence(0, n-1) COUNTS DOWN for n=0 (emitting phantom frames) and
    // the stride division divides by zero — same hazard chunk() guards
    require(n >= 1 && frameBytes >= 1,
      s"n=$n, frameBytes=$frameBytes must be >= 1")
    media.select(col("media_id"), col("meta.kind").as("kind"),
      posexplode(transform(sequence(lit(0), lit(n - 1)),
        i => substring(col("payload"),
          (i * greatest(length(col("payload")) / n, lit(1)) + 1).cast("int"),
          lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_id")
      .withColumnRenamed("col", "frame_bytes")
  }

  /** Resize stub: deterministic byte-level downsample to `targetBytes`
    * (every k-th byte) — the real implementation would call an image
    * library here. Byte slices are reassembled with binary `concat` via an
    * aggregate fold — a string round-trip would UTF-8-mangle non-text
    * payloads.
    */
  def resizeStub(payload: org.apache.spark.sql.Column,
      targetBytes: Int): org.apache.spark.sql.Column = {
    // targetBytes=0 would duplicate the first byte via a counting-down
    // sequence and divide by zero under ANSI
    require(targetBytes >= 1, s"targetBytes=$targetBytes must be >= 1")
    val stride = greatest(length(payload) / targetBytes, lit(1))
    val slices = transform(sequence(lit(1), least(length(payload), lit(targetBytes))),
      i => substring(payload, ((i - 1) * stride + 1).cast("int"), lit(1)))
    aggregate(slices, lit(Array.emptyByteArray), (acc, b) => concat(acc, b))
  }
}
