package graft.northstar

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (BASELINE.json
  * north-star).
  *
  * Media are opaque `binary` payloads with a typed metadata struct; the
  * Spark-side plumbing — schema, partition-friendly batch iteration, typed
  * encoders, frame slicing — is real and tested. The actual codec calls are
  * STUBBED with a deterministic fake (this container ships no image/audio
  * libraries): `decodeStub` derives features from raw bytes so pipelines
  * exercise realistic shapes end-to-end.
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
      byte_histogram: Array[Long], checksum: Long)

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

  /** Feature extraction over payload bytes. The decode step is a STUB —
    * a real deployment swaps `fakeDecode` for the codec call; everything
    * around it (typed mapPartitions, batch shape, output schema) is the
    * production plumbing.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        // STUB: deterministic fake decode — byte histogram + rolling checksum
        // stands in for pixel/sample statistics.
        val hist = new Array[Long](16)
        var checksum = 1125899906842597L
        var i = 0
        while (i < r.payload.length) {
          hist((r.payload(i) & 0xff) >> 4) += 1
          checksum = checksum * 31 + (r.payload(i) & 0xff)
          i += 1
        }
        MediaFeatures(r.media_id, r.meta.kind, r.payload.length, hist, checksum)
      }
    }
  }

  /** Frame sampling: slice `n` evenly-spaced fixed-width byte windows from
    * the payload (the video-keyframe access pattern) — pure Column algebra,
    * no decode needed for the slicing itself.
    */
  def sampleFrames(media: DataFrame, n: Int, frameBytes: Int): DataFrame =
    media.select(col("media_id"), col("meta.kind").as("kind"),
      posexplode(transform(sequence(lit(0), lit(n - 1)),
        i => substring(col("payload"),
          (i * greatest(length(col("payload")) / n, lit(1)) + 1).cast("int"),
          lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_id")
      .withColumnRenamed("col", "frame_bytes")

  /** Resize stub: deterministic byte-level downsample to `targetBytes`
    * (every k-th byte) — the real implementation would call an image
    * library here. Byte slices are reassembled with binary `concat` via an
    * aggregate fold — a string round-trip would UTF-8-mangle non-text
    * payloads.
    */
  def resizeStub(payload: org.apache.spark.sql.Column,
      targetBytes: Int): org.apache.spark.sql.Column = {
    val stride = greatest(length(payload) / targetBytes, lit(1))
    val slices = transform(sequence(lit(1), least(length(payload), lit(targetBytes))),
      i => substring(payload, ((i - 1) * stride + 1).cast("int"), lit(1)))
    aggregate(slices, lit(Array.emptyByteArray), (acc, b) => concat(acc, b))
  }
}
