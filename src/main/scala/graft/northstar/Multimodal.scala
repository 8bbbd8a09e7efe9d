package graft.northstar

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (BASELINE.json
  * north-star).
  *
  * Media are opaque `binary` payloads with a typed metadata struct; the
  * Spark-side plumbing — schema, partition-friendly batch iteration, typed
  * encoders, frame slicing — is real and tested. The pure-JVM
  * [[Multimodal.MediaDecoder.ContainerHeaders]] decoder does REAL codec
  * work for the three synthesized formats: PNG pixel decode (zlib
  * inflate + unfilter, q91), 16-bit PCM WAV samples (q90), and baseline
  * JPEG DCT decode (Huffman entropy + IDCT, q96/q99) including
  * PROGRESSIVE (SOF2) multi-scan streams (q102) — plus header-level
  * dims/format parses. Exotic codecs (video, arithmetic-coded JPEG,
  * lossy audio) stay behind the same pluggable [[Multimodal.MediaDecoder]]
  * seam a deployment binds a codec library to;
  * [[Multimodal.MediaDecoder.Fake]] is the deterministic test double.
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

  /** Sample-table metadata of an ISO-BMFF (MP4) video track — what the
    * keyframe-sampling stage (q106) consumes: media timescale and frame
    * dims from `mdhd`/`stsd`, per-sample durations expanded from `stts`
    * runs, 1-based sync-sample numbers from `stss` (every sample when the
    * box is absent, ISO/IEC 14496-12 §8.6.2), per-sample byte sizes from
    * `stsz`, and the first chunk's absolute file offset from `stco`.
    */
  final case class Mp4Track(timescale: Int, width: Int, height: Int,
      sampleDeltas: Array[Long], syncSamples: Array[Int],
      sampleSizes: Array[Int], chunkOffset: Long)

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
    /** Signed 16-bit PCM samples (interleaved stream) if this decoder can
      * read the container — the sample-level slot frame-energy features
      * build on (q90).
      */
    def pcmSamples(payload: Array[Byte]): Option[Array[Int]] = None

    /** Format AND samples from one header walk — what per-row consumers
      * needing both (q90) should call.
      */
    def pcmWithFormat(payload: Array[Byte]): Option[(AudioFormat, Array[Int])] =
      None

    /** (width, height, row-major RGB bytes) if this decoder can fully
      * decode the image payload — the pixel-level slot channel-stat
      * features build on (q91).
      */
    def pngPixels(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] =
      None

    /** (width, height, row-major LUMINANCE bytes) if this decoder can
      * fully decode a baseline JPEG payload — the DCT-decode slot (q96),
      * completing the real-decode story pngPixels/pcmSamples tell for
      * PNG/WAV.
      */
    def jpegPixels(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] =
      None

    /** Sample-table parse of the first video track if the payload is a
      * recognized ISO-BMFF (MP4) container — the container-walk slot
      * keyframe sampling builds on (q106).
      */
    def mp4Track(payload: Array[Byte]): Option[Mp4Track] = None
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

      /** Decode an 8-bit-truecolor, filter-None PNG to its raw RGB pixel
        * bytes: chunk walk (length/type/data/crc per RFC 2083 §3.1),
        * IDAT concatenation, REAL zlib inflate
        * (`java.util.zip.Inflater`), then scanline unfiltering restricted
        * to the one filter this decoder claims (type 0 — anything else
        * is None, not a misread; same refusal discipline as
        * [[pcmSamples]]). Returns (width, height, pixelBytes) with
        * filter bytes stripped — row-major RGB interleaved.
        */
      override def pngPixels(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
        if (b.length < 33 || !b.startsWith(PngSig)) return None
        if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
          return None
        val (w, h) = (be32(b, 16), be32(b, 20))
        if (w < 1 || h < 1 || b(24) != 8 || b(25) != 2) return None
        // chunk walk from past IHDR, concatenating IDAT payloads
        val idat = new java.io.ByteArrayOutputStream()
        var i = 33
        var done = false
        while (!done && i + 8 <= b.length) {
          val len = be32(b, i)
          if (len < 0 || len > b.length - i - 12) return None
          val t = new String(b, i + 4, 4, "US-ASCII")
          if (t == "IDAT") idat.write(b, i + 8, len)
          if (t == "IEND") done = true
          i += 12 + len
        }
        val comp = idat.toByteArray
        if (comp.isEmpty) return None
        // size sanity BEFORE allocating from attacker-controlled header
        // dims: compute in Long (3·w and h·stride overflow Int for crafted
        // headers → NegativeArraySizeException would escape the Option
        // contract), and reject claims beyond zlib's hard 1032:1 max
        // expansion of the actual payload — a tiny file cannot
        // legitimately inflate to gigabytes
        val strideL = 1L + 3L * w
        val rawLen = strideL * h
        if (rawLen > 1032L * comp.length + 64L || rawLen > (1L << 28))
          return None
        val stride = strideL.toInt
        val raw = new Array[Byte](rawLen.toInt)
        val inf = new java.util.zip.Inflater()
        inf.setInput(comp)
        // inflate until stream end or stall — one call need not drain it;
        // needsDictionary is a stall too (FDICT streams make inflate
        // return 0 with input remaining and space available — forever)
        var off = 0
        var stalled = false
        try {
          while (!inf.finished() && !stalled) {
            val k = inf.inflate(raw, off, raw.length - off)
            off += k
            if (k == 0 && (inf.needsInput() || inf.needsDictionary() ||
              off == raw.length))
              stalled = true
          }
        } catch {
          case _: java.util.zip.DataFormatException => inf.end(); return None
        }
        val complete = inf.finished()
        inf.end()
        if (!complete || off != raw.length) return None // truncated/oversized
        val px = new Array[Byte](3 * w * h)
        var r = 0
        while (r < h) {
          if (raw(r * stride) != 0) return None // only filter None handled
          System.arraycopy(raw, r * stride + 1, px, r * 3 * w, 3 * w)
          r += 1
        }
        Some((w, h, px))
      }

      /** Decode the `data` chunk of a 16-bit PCM WAV to signed samples
        * (interleaved stream, little-endian per the WAVE spec), plus the
        * parsed format — ONE chunk walk captures both, so per-row
        * consumers (q90 needs sample_rate/channels AND samples) do not
        * re-walk the header. Only the format this decoder claims to
        * understand: PCM at 16 bits — anything else is None, not a
        * misread. Same bounds discipline as the [[audioFormat]] walk; a
        * trailing odd byte is ignored (cannot be half a sample).
        */
      override def pcmWithFormat(
          b: Array[Byte]): Option[(AudioFormat, Array[Int])] = {
        if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
          b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
          b(11) != 'E') return None
        var fmt: Option[AudioFormat] = None
        var dataAt = -1
        var dataSize = 0
        var i = 12
        while (i + 8 <= b.length) {
          val size = le32(b, i + 4)
          if (size < 0 || size > b.length - i - 8) return None
          if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' &&
            b(i + 3) == ' ') {
            if (size < 16 || i + 8 + 16 > b.length) return None
            // only the format this decoder claims: audio-format tag 1 is
            // integer PCM — a 16-bit WAVE_FORMAT_EXTENSIBLE or compressed
            // container must be refused, not decoded as raw PCM. The
            // FIRST fmt chunk wins (same stop-at-first as audioFormat, so
            // the two walks can never disagree on one payload).
            if (le16(b, i + 8) != 1) return None
            if (fmt.isEmpty)
              fmt = Some(AudioFormat(le32(b, i + 12), le16(b, i + 10),
                le16(b, i + 22)))
          } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' &&
            b(i + 3) == 'a' && dataAt < 0) {
            dataAt = i + 8; dataSize = size
          }
          i += 8 + size + (size & 1)
        }
        val f = fmt.getOrElse(return None)
        if (f.bits_per_sample != 16 || dataAt < 0) return None
        val n = dataSize / 2
        val out = new Array[Int](n)
        var k = 0
        while (k < n) {
          out(k) = le16(b, dataAt + 2 * k).toShort.toInt // sign-extend
          k += 1
        }
        Some((f, out))
      }

      override def pcmSamples(b: Array[Byte]): Option[Array[Int]] =
        pcmWithFormat(b).map(_._2)

      /** Decode a BASELINE sequential JPEG frame to per-component
        * FULL-RESOLUTION sample planes — the full ITU T.81 path: marker
        * walk (APPn/COM skipped, DQT/DHT/SOF0/DRI parsed), interleaved
        * MCU walk over arbitrary 1–4 sampling factors, canonical Huffman
        * entropy decode with byte unstuffing and restart-marker resync,
        * per-component DC predictors + amplitude extend, zigzag
        * dequantization, 2-D IDCT, level shift, clamp, and nearest-
        * neighbor chroma upsampling to frame resolution. Only the
        * formats this decoder claims: 8-bit precision, 1 or 3
        * components, Huffman sequential (SOF0) — anything else
        * (progressive, arithmetic, 16-bit DQT, CMYK) is None, not a
        * misread; same refusal discipline as [[pngPixels]]. The IDCT is
        * the exact double-precision definition (T.81 A.3.3) — a
        * production decoder would swap a fast fixed-point kernel at this
        * seam; spec conformance allows ±1 per sample between compliant
        * IDCTs, which is why the cross-decoder tests budget tolerances
        * while the q96/q99 oracles (DC-only blocks, exact arithmetic)
        * demand hash equality.
        */
      private def jpegFrame(
          b: Array[Byte]): Option[(Int, Int, Array[Array[Byte]])] = {
        if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
          return None
        val quant = new Array[Array[Int]](4)
        val huffDc = new Array[Jpeg.HuffTable](4)
        val huffAc = new Array[Jpeg.HuffTable](4)
        var w = 0; var h = 0
        var ncomp = 0
        var compIds: Array[Int] = null
        var compH: Array[Int] = null
        var compV: Array[Int] = null
        var compQ: Array[Int] = null
        var restart = 0
        var scanDc: Array[Int] = null
        var scanAc: Array[Int] = null
        var dataAt = -1
        var i = 2
        try {
          while (dataAt < 0) {
            if (i + 1 >= b.length) return None
            if ((b(i) & 0xff) != 0xff) return None // desynced marker stream
            val marker = b(i + 1) & 0xff
            if (marker == 0xff) { i += 1 } // fill byte
            else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) {
              i += 2
            } else if (marker == 0xd9) { return None // EOI before any scan
            } else {
              if (i + 4 > b.length) return None
              val len = be16(b, i + 2)
              if (len < 2 || i + 2 + len > b.length) return None
              val seg = i + 4
              val segEnd = i + 2 + len
              marker match {
                case 0xdb => // DQT: one or more (pq/tq, 64 entries) tables
                  var j = seg
                  while (j < segEnd) {
                    val pq = (b(j) & 0xf0) >> 4
                    val tq = b(j) & 0x0f
                    if (pq != 0) return None // 16-bit tables not claimed
                    if (j + 65 > segEnd) return None
                    quant(tq) = Array.tabulate(64)(k => b(j + 1 + k) & 0xff)
                    j += 65
                  }
                case 0xc4 => // DHT: one or more (class/id, bits, values)
                  var j = seg
                  while (j < segEnd) {
                    val tc = (b(j) & 0xf0) >> 4
                    val th = b(j) & 0x0f
                    if (j + 17 > segEnd) return None
                    val bits = Array.tabulate(16)(k => b(j + 1 + k) & 0xff)
                    val n = bits.sum
                    if (j + 17 + n > segEnd) return None
                    val vals = Array.tabulate(n)(k => b(j + 17 + k) & 0xff)
                    val t = Jpeg.huffTable(bits, vals)
                    if (tc == 0) huffDc(th) = t else huffAc(th) = t
                    j += 17 + n
                  }
                case 0xc0 => // SOF0 — baseline sequential
                  if (len < 8) return None
                  if ((b(seg) & 0xff) != 8) return None // precision
                  h = be16(b, seg + 1); w = be16(b, seg + 3)
                  ncomp = b(seg + 5) & 0xff
                  if ((ncomp != 1 && ncomp != 3) || w < 1 || h < 1)
                    return None // grayscale or YCbCr only
                  if (len < 8 + 3 * ncomp) return None
                  compIds = new Array[Int](ncomp)
                  compH = new Array[Int](ncomp)
                  compV = new Array[Int](ncomp)
                  compQ = new Array[Int](ncomp)
                  for (c <- 0 until ncomp) {
                    compIds(c) = b(seg + 6 + 3 * c) & 0xff
                    val s = b(seg + 7 + 3 * c) & 0xff
                    compH(c) = (s & 0xf0) >> 4
                    compV(c) = s & 0x0f
                    compQ(c) = b(seg + 8 + 3 * c) & 0x0f
                    if (compH(c) < 1 || compH(c) > 4 || compV(c) < 1 ||
                      compV(c) > 4) return None
                  }
                case 0xc2 => // SOF2 — progressive Huffman: own decode path
                  return jpegFrameProgressive(b)
                case m if (m >= 0xc1 && m <= 0xcf) && m != 0xc4 &&
                    m != 0xc8 && m != 0xcc =>
                  return None // arithmetic/lossless/hierarchical — not claimed
                case 0xdd => // DRI
                  if (len != 4) return None
                  restart = be16(b, seg)
                case 0xda => // SOS
                  if (ncomp == 0) return None // SOS before SOF
                  val ns = b(seg) & 0xff
                  if (ns != ncomp || len < 6 + 2 * ns) return None
                  scanDc = new Array[Int](ncomp)
                  scanAc = new Array[Int](ncomp)
                  for (c <- 0 until ns) {
                    val cid = b(seg + 1 + 2 * c) & 0xff
                    // scan components must arrive in frame order (the
                    // interleaved-MCU layout below assumes it)
                    if (cid != compIds(c)) return None
                    scanDc(c) = (b(seg + 2 + 2 * c) & 0xf0) >> 4
                    scanAc(c) = b(seg + 2 + 2 * c) & 0x0f
                  }
                  dataAt = segEnd
                case _ => () // APPn / COM / unknown: skip
              }
              if (dataAt < 0) i = segEnd
            }
          }
          for (c <- 0 until ncomp)
            if (quant(compQ(c)) == null || huffDc(scanDc(c)) == null ||
              huffAc(scanAc(c)) == null) return None
          val hmax = compH.max
          val vmax = compV.max
          val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
          val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
          // padded per-component planes covering whole MCUs; sampled down
          // to frame resolution at the end
          val planeW = Array.tabulate(ncomp)(c => mcusX * compH(c) * 8)
          val planeH = Array.tabulate(ncomp)(c => mcusY * compV(c) * 8)
          val planes = Array.tabulate(ncomp)(c =>
            new Array[Byte](planeW(c) * planeH(c)))
          val reader = new Jpeg.BitReader(b, dataAt)
          val coef = new Array[Int](64)
          val preds = new Array[Int](ncomp)
          var mcu = 0
          var rstExpect = 0
          while (mcu < mcusX * mcusY) {
            if (restart > 0 && mcu > 0 && mcu % restart == 0) {
              reader.expectRst(rstExpect)
              rstExpect = (rstExpect + 1) % 8
              java.util.Arrays.fill(preds, 0)
            }
            val mx = mcu % mcusX
            val my = mcu / mcusX
            for (c <- 0 until ncomp; v <- 0 until compV(c);
                hh <- 0 until compH(c)) {
              java.util.Arrays.fill(coef, 0)
              val q = quant(compQ(c))
              val s0 = reader.decode(huffDc(scanDc(c)))
              preds(c) += Jpeg.extend(reader.bits(s0), s0)
              coef(0) = preds(c) * q(0)
              var k = 1
              var eob = false
              while (k <= 63 && !eob) {
                val rs = reader.decode(huffAc(scanAc(c)))
                val r = rs >> 4
                val s = rs & 0x0f
                if (s == 0) {
                  if (r == 15) k += 16 else eob = true // ZRL vs EOB
                } else {
                  k += r
                  if (k > 63) throw Jpeg.Bail
                  coef(Jpeg.Zigzag(k)) =
                    Jpeg.extend(reader.bits(s), s) * q(k)
                  k += 1
                }
              }
              Jpeg.idctInto(coef, planes(c), planeW(c), planeH(c),
                (mx * compH(c) + hh) * 8, (my * compV(c) + v) * 8)
            }
            mcu += 1
          }
          // nearest-neighbor sample each plane to frame resolution
          val out = Array.tabulate(ncomp) { c =>
            if (compH(c) == hmax && compV(c) == vmax && planeW(c) == w &&
              planeH(c) == h) planes(c)
            else {
              val full = new Array[Byte](w * h)
              var y = 0
              while (y < h) {
                val sy = y * compV(c) / vmax
                var x = 0
                while (x < w) {
                  full(y * w + x) =
                    planes(c)(sy * planeW(c) + x * compH(c) / hmax)
                  x += 1
                }
                y += 1
              }
              full
            }
          }
          Some((w, h, out))
        } catch { case Jpeg.Bail => None }
      }

      /** Decode a PROGRESSIVE Huffman JPEG frame (SOF2) to per-component
        * full-resolution planes — ITU T.81 Annex G: spectral selection
        * (per-scan [Ss, Se] coefficient bands) and successive
        * approximation (Ah/Al bit planes), accumulated across scans into
        * a per-block coefficient store and IDCT'd once at EOI. Scan
        * kinds: DC-first (interleaved or not; values arrive
        * point-transformed, stored `<< Al`), DC-refinement (one raw bit
        * per block, OR'd in at bit Al — two's complement makes this
        * exact for negative DCs too), AC-first (single-component per
        * G.1.1.1.1, with EOB-run codes `RRRR|0, RRRR < 15` spanning up
        * to 32767 blocks), and AC-refinement (the G.1.2.3 correction-bit
        * walk: every nonzero-history coefficient in the band consumes a
        * bit, ±2^Al applied when set; ZRL skips 16 zero-history slots).
        * Non-interleaved scans walk the component's OWN block grid
        * (ceil(ceil(dim·c/max)/8), T.81 A.2.2), not the MCU-padded one;
        * restart intervals reset predictors AND the EOB run. Shares the
        * baseline path's refusal discipline: 8-bit precision, 1 or 3
        * components, Huffman only; malformed scan headers (DC band ≠
        * [0,0], multi-component AC scan, Ah ≠ Al+1 on refinement) are
        * None, not a misread.
        */
      private def jpegFrameProgressive(
          b: Array[Byte]): Option[(Int, Int, Array[Array[Byte]])] = {
        if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
          return None
        val quant = new Array[Array[Int]](4)
        val huffDc = new Array[Jpeg.HuffTable](4)
        val huffAc = new Array[Jpeg.HuffTable](4)
        var w = 0; var h = 0
        var ncomp = 0
        var compIds: Array[Int] = null
        var compH: Array[Int] = null
        var compV: Array[Int] = null
        var compQ: Array[Int] = null
        var restart = 0
        var mcusX = 0; var mcusY = 0
        // per-component coefficient store, ZIGZAG order, 64 per block,
        // blocks on the MCU-padded grid (padW x padH)
        var coefs: Array[Array[Int]] = null
        var padW: Array[Int] = null; var padH: Array[Int] = null
        var nbW: Array[Int] = null; var nbH: Array[Int] = null
        var sawScan = false

        /** Decode one scan's entropy data starting at `dataAt`; returns
          * the index of the next marker's 0xFF byte.
          */
        def decodeScan(dataAt: Int, sc: Array[Int], sdc: Array[Int],
            sac: Array[Int], ss: Int, se: Int, ah: Int, al: Int): Int = {
          val reader = new Jpeg.BitReader(b, dataAt)
          val preds = new Array[Int](ncomp)
          var eobrun = 0
          var rstExpect = 0
          val p1 = 1 << al

          def resync(): Unit = {
            reader.expectRst(rstExpect)
            rstExpect = (rstExpect + 1) % 8
            java.util.Arrays.fill(preds, 0)
            eobrun = 0
          }
          def correct(ci: Int, idx: Int): Unit = {
            val cur = coefs(ci)(idx)
            if (reader.bit() == 1 && (cur & p1) == 0)
              coefs(ci)(idx) = if (cur >= 0) cur + p1 else cur - p1
          }
          def dcBlock(j: Int, off: Int): Unit =
            if (ah == 0) {
              val s = reader.decode(huffDc(sdc(j)))
              preds(j) += Jpeg.extend(reader.bits(s), s)
              coefs(sc(j))(off) = preds(j) << al
            } else if (reader.bit() == 1) coefs(sc(j))(off) |= p1
          def acFirstBlock(ci: Int, off: Int): Unit =
            if (eobrun > 0) eobrun -= 1
            else {
              var k = ss
              while (k <= se) {
                val rs = reader.decode(huffAc(sac(0)))
                val r = rs >> 4
                val s = rs & 0x0f
                if (s == 0) {
                  if (r == 15) k += 16 // ZRL
                  else { // EOBn: this block ends; run covers r-bit more
                    eobrun = (1 << r) - 1
                    if (r > 0) eobrun += reader.bits(r)
                    k = 64
                  }
                } else {
                  k += r
                  if (k > se) throw Jpeg.Bail
                  coefs(ci)(off + k) = Jpeg.extend(reader.bits(s), s) << al
                  k += 1
                }
              }
            }
          def acRefineBlock(ci: Int, off: Int): Unit = {
            var k = ss
            if (eobrun == 0) {
              var inBand = true
              while (inBand && k <= se) {
                val rs = reader.decode(huffAc(sac(0)))
                var r = rs >> 4
                val s = rs & 0x0f
                var newval = 0
                if (s == 0) {
                  if (r < 15) { // EOB: run INCLUDES this block's tail
                    eobrun = 1 << r
                    if (r > 0) eobrun += reader.bits(r)
                    inBand = false
                  } // r == 15: ZRL — skip 16 zero-history slots below
                } else {
                  if (s != 1) throw Jpeg.Bail // refinement sends ±1 only
                  newval = if (reader.bit() == 1) p1 else -p1
                }
                if (inBand) {
                  var placed = false
                  while (!placed && k <= se) {
                    if (coefs(ci)(off + k) != 0) { correct(ci, off + k); k += 1 }
                    else if (r == 0) placed = true
                    else { r -= 1; k += 1 }
                  }
                  if (newval != 0) {
                    if (k > se) throw Jpeg.Bail
                    coefs(ci)(off + k) = newval
                  }
                  k += 1
                }
              }
            }
            if (eobrun > 0) { // correct the rest of this block's band
              while (k <= se) {
                if (coefs(ci)(off + k) != 0) correct(ci, off + k)
                k += 1
              }
              eobrun -= 1
            }
          }

          // T.81 A.2.2: a scan is interleaved iff Ns > 1 — a
          // single-component DC scan walks the component's OWN block grid
          // (nbW×nbH) whatever its sampling factors; routing it through
          // the MCU-padded grid would mis-decode when padW != nbW (image
          // width not a multiple of 8·hmax)
          if (ss == 0) { // DC scan: MCU-interleaved only when Ns > 1
            if (sc.length > 1) {
              var mcu = 0
              while (mcu < mcusX * mcusY) {
                if (restart > 0 && mcu > 0 && mcu % restart == 0) resync()
                val mx = mcu % mcusX
                val my = mcu / mcusX
                for (j <- sc.indices; v <- 0 until compV(sc(j));
                    hh <- 0 until compH(sc(j))) {
                  val ci = sc(j)
                  dcBlock(j, ((my * compV(ci) + v) * padW(ci) +
                    mx * compH(ci) + hh) * 64)
                }
                mcu += 1
              }
            } else { // single component: its own block grid
              val ci = sc(0)
              var blk = 0
              while (blk < nbW(ci) * nbH(ci)) {
                if (restart > 0 && blk > 0 && blk % restart == 0) resync()
                dcBlock(0, ((blk / nbW(ci)) * padW(ci) + blk % nbW(ci)) * 64)
                blk += 1
              }
            }
          } else { // AC scan: always non-interleaved (checked at SOS)
            val ci = sc(0)
            var blk = 0
            while (blk < nbW(ci) * nbH(ci)) {
              if (restart > 0 && blk > 0 && blk % restart == 0) resync()
              val off = ((blk / nbW(ci)) * padW(ci) + blk % nbW(ci)) * 64
              if (ah == 0) acFirstBlock(ci, off) else acRefineBlock(ci, off)
              blk += 1
            }
          }
          // skip flush padding / trailing RSTn to the next real marker
          var j = reader.pos
          while (j + 1 < b.length && !((b(j) & 0xff) == 0xff &&
            (b(j + 1) & 0xff) != 0x00 && (b(j + 1) & 0xff) != 0xff &&
            !((b(j + 1) & 0xff) >= 0xd0 && (b(j + 1) & 0xff) <= 0xd7)))
            j += 1
          if (j + 1 >= b.length) throw Jpeg.Bail
          j
        }

        var i = 2
        try {
          var done = false
          while (!done) {
            if (i + 1 >= b.length) return None
            if ((b(i) & 0xff) != 0xff) return None
            val marker = b(i + 1) & 0xff
            if (marker == 0xff) { i += 1 } // fill byte
            else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) {
              i += 2
            } else if (marker == 0xd9) { done = true
            } else {
              if (i + 4 > b.length) return None
              val len = be16(b, i + 2)
              if (len < 2 || i + 2 + len > b.length) return None
              val seg = i + 4
              val segEnd = i + 2 + len
              marker match {
                case 0xdb =>
                  var j = seg
                  while (j < segEnd) {
                    val pq = (b(j) & 0xf0) >> 4
                    val tq = b(j) & 0x0f
                    if (pq != 0) return None // 16-bit tables not claimed
                    if (j + 65 > segEnd) return None
                    quant(tq) = Array.tabulate(64)(k => b(j + 1 + k) & 0xff)
                    j += 65
                  }
                  i = segEnd
                case 0xc4 =>
                  var j = seg
                  while (j < segEnd) {
                    val tc = (b(j) & 0xf0) >> 4
                    val th = b(j) & 0x0f
                    if (j + 17 > segEnd) return None
                    val bits = Array.tabulate(16)(k => b(j + 1 + k) & 0xff)
                    val n = bits.sum
                    if (j + 17 + n > segEnd) return None
                    val vals = Array.tabulate(n)(k => b(j + 17 + k) & 0xff)
                    val t = Jpeg.huffTable(bits, vals)
                    if (tc == 0) huffDc(th) = t else huffAc(th) = t
                    j += 17 + n
                  }
                  i = segEnd
                case 0xc2 => // SOF2
                  if (ncomp != 0) return None // one frame only
                  if (len < 8) return None
                  if ((b(seg) & 0xff) != 8) return None // precision
                  h = be16(b, seg + 1); w = be16(b, seg + 3)
                  ncomp = b(seg + 5) & 0xff
                  if ((ncomp != 1 && ncomp != 3) || w < 1 || h < 1)
                    return None
                  if (len < 8 + 3 * ncomp) return None
                  compIds = new Array[Int](ncomp)
                  compH = new Array[Int](ncomp)
                  compV = new Array[Int](ncomp)
                  compQ = new Array[Int](ncomp)
                  for (c <- 0 until ncomp) {
                    compIds(c) = b(seg + 6 + 3 * c) & 0xff
                    val s = b(seg + 7 + 3 * c) & 0xff
                    compH(c) = (s & 0xf0) >> 4
                    compV(c) = s & 0x0f
                    compQ(c) = b(seg + 8 + 3 * c) & 0x0f
                    if (compH(c) < 1 || compH(c) > 4 || compV(c) < 1 ||
                      compV(c) > 4) return None
                  }
                  val hmax = compH.max
                  val vmax = compV.max
                  mcusX = (w + 8 * hmax - 1) / (8 * hmax)
                  mcusY = (h + 8 * vmax - 1) / (8 * vmax)
                  padW = Array.tabulate(ncomp)(c => mcusX * compH(c))
                  padH = Array.tabulate(ncomp)(c => mcusY * compV(c))
                  nbW = Array.tabulate(ncomp)(c =>
                    (w * compH(c) + 8 * hmax - 1) / (8 * hmax))
                  nbH = Array.tabulate(ncomp)(c =>
                    (h * compV(c) + 8 * vmax - 1) / (8 * vmax))
                  coefs = Array.tabulate(ncomp)(c =>
                    new Array[Int](padW(c) * padH(c) * 64))
                  i = segEnd
                case m if (m >= 0xc0 && m <= 0xcf) && m != 0xc4 &&
                    m != 0xc8 && m != 0xcc =>
                  return None // a second frame kind — not claimed
                case 0xdd =>
                  if (len != 4) return None
                  restart = be16(b, seg)
                  i = segEnd
                case 0xda =>
                  if (coefs == null) return None // SOS before SOF2
                  val ns = b(seg) & 0xff
                  if (ns < 1 || ns > ncomp || len < 6 + 2 * ns) return None
                  val sc = new Array[Int](ns)
                  val sdc = new Array[Int](ns)
                  val sac = new Array[Int](ns)
                  for (j <- 0 until ns) {
                    val ci = compIds.indexOf(b(seg + 1 + 2 * j) & 0xff)
                    if (ci < 0) return None
                    sc(j) = ci
                    sdc(j) = (b(seg + 2 + 2 * j) & 0xf0) >> 4
                    sac(j) = b(seg + 2 + 2 * j) & 0x0f
                  }
                  val ss = b(seg + 1 + 2 * ns) & 0xff
                  val se = b(seg + 2 + 2 * ns) & 0xff
                  val aa = b(seg + 3 + 2 * ns) & 0xff
                  val ah = (aa & 0xf0) >> 4
                  val al = aa & 0x0f
                  // G.1 scan-header legality this decoder claims
                  if (se > 63 || se < ss || al > 13) return None
                  if (ss == 0 && se != 0) return None // DC band is [0,0]
                  if (ss > 0 && ns != 1) return None // AC: one component
                  if (ah != 0 && ah != al + 1) return None
                  for (j <- 0 until ns) {
                    if (ss == 0 && ah == 0 && huffDc(sdc(j)) == null)
                      return None
                    if (ss > 0 && huffAc(sac(j)) == null) return None
                  }
                  i = decodeScan(segEnd, sc, sdc, sac, ss, se, ah, al)
                  sawScan = true
                case _ => i = segEnd // APPn / COM / unknown: skip
              }
            }
          }
          if (!sawScan) return None
          for (c <- 0 until ncomp) if (quant(compQ(c)) == null) return None
          // dequantize (zigzag -> natural) + IDCT every block
          val planes = Array.tabulate(ncomp)(c =>
            new Array[Byte](padW(c) * 8 * padH(c) * 8))
          val nat = new Array[Int](64)
          for (c <- 0 until ncomp) {
            val q = quant(compQ(c))
            val pw = padW(c) * 8
            val ph = padH(c) * 8
            var blk = 0
            while (blk < padW(c) * padH(c)) {
              java.util.Arrays.fill(nat, 0)
              val off = blk * 64
              var k = 0
              while (k < 64) {
                val v = coefs(c)(off + k)
                if (v != 0) nat(Jpeg.Zigzag(k)) = v * q(k)
                k += 1
              }
              Jpeg.idctInto(nat, planes(c), pw, ph,
                (blk % padW(c)) * 8, (blk / padW(c)) * 8)
              blk += 1
            }
          }
          // nearest-neighbor sample each plane to frame resolution
          val hmax = compH.max
          val vmax = compV.max
          val out = Array.tabulate(ncomp) { c =>
            val pw = padW(c) * 8
            if (compH(c) == hmax && compV(c) == vmax && pw == w &&
              padH(c) * 8 == h) planes(c)
            else {
              val full = new Array[Byte](w * h)
              var y = 0
              while (y < h) {
                val sy = y * compV(c) / vmax
                var x = 0
                while (x < w) {
                  full(y * w + x) = planes(c)(sy * pw + x * compH(c) / hmax)
                  x += 1
                }
                y += 1
              }
              full
            }
          }
          Some((w, h, out))
        } catch { case Jpeg.Bail => None }
      }

      /** Luminance pixels of a GRAYSCALE baseline JPEG (see
        * [[jpegFrame]]); a color frame is not this method's claim — use
        * [[jpegRgbPixels]].
        */
      override def jpegPixels(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
        jpegFrame(b) match {
          case Some((w, h, planes)) if planes.length == 1 =>
            Some((w, h, planes(0)))
          case _ => None
        }

      /** Row-major interleaved RGB pixels of a 3-component YCbCr
        * baseline JPEG (any 1–4 sampling factors, e.g. 4:2:0 or 4:4:4).
        * The color conversion is the JFIF formula in INTEGER fixed-point
        * (16-bit scaled constants, round-half via +2^15 then floor-shift
        * — libjpeg's descale shape), so converted pixels are exact
        * integer arithmetic a SQL oracle can replay (q99), not
        * float-rounding-dependent.
        */
      def jpegRgbPixels(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
        jpegFrame(b) match {
          case Some((w, h, planes)) if planes.length == 3 =>
            val (py, pcb, pcr) = (planes(0), planes(1), planes(2))
            val out = new Array[Byte](3 * w * h)
            var j = 0
            while (j < w * h) {
              val y = py(j) & 0xff
              val cb = (pcb(j) & 0xff) - 128
              val cr = (pcr(j) & 0xff) - 128
              def clamp(v: Int): Byte =
                (if (v < 0) 0 else if (v > 255) 255 else v).toByte
              out(3 * j) = clamp(y + ((91881 * cr + 32768) >> 16))
              out(3 * j + 1) =
                clamp(y - ((22554 * cb + 46802 * cr + 32768) >> 16))
              out(3 * j + 2) = clamp(y + ((116130 * cb + 32768) >> 16))
              j += 1
            }
            Some((w, h, out))
          case _ => None
        }

      /** ISO/IEC 14496-12 box walk + sample-table parse. Real structure
        * work: the nested container descent (moov → trak → mdia → minf →
        * stbl), both FullBox versions of `mdhd` (v1 widens creation/
        * modification/duration to 64 bits, moving the timescale from
        * payload offset 12 to 20, §8.4.2), `stts` run-length expansion,
        * the optional `stss` sync table (absent ⇒ every sample is a sync
        * sample, §8.6.2), `stsz` in both its uniform-size and per-sample
        * layouts, and `stco`'s chunk offset. Corrupt declared sizes —
        * a box overrunning its container or smaller than its own header —
        * reject the parse (None), mirroring the RIFF walk's discipline.
        */
      override def mp4Track(b: Array[Byte]): Option[Mp4Track] = {
        val n = b.length
        // the file-level brand box must lead (§4.3) — random binary with
        // a stray 'moov' string deeper in should not parse
        if (n < 8 || b(4) != 'f' || b(5) != 't' || b(6) != 'y' || b(7) != 'p')
          return None
        for {
          moov <- mp4Child(b, 0, n, "moov")
          trak <- mp4Child(b, moov._1, moov._2, "trak")
          mdia <- mp4Child(b, trak._1, trak._2, "mdia")
          mdhd <- mp4Child(b, mdia._1, mdia._2, "mdhd")
          minf <- mp4Child(b, mdia._1, mdia._2, "minf")
          stbl <- mp4Child(b, minf._1, minf._2, "stbl")
          stsd <- mp4Child(b, stbl._1, stbl._2, "stsd")
          stts <- mp4Child(b, stbl._1, stbl._2, "stts")
          stsz <- mp4Child(b, stbl._1, stbl._2, "stsz")
          stco <- mp4Child(b, stbl._1, stbl._2, "stco")
          timescale <- mdhdTimescale(b, mdhd._1, mdhd._2)
          dims <- stsdDims(b, stsd._1, stsd._2)
          deltas <- sttsDeltas(b, stts._1, stts._2)
          sizes <- stszSizes(b, stsz._1, stsz._2)
          if deltas.length == sizes.length && sizes.length > 0
          off <- stcoFirst(b, stco._1, stco._2)
          sync <- (mp4Child(b, stbl._1, stbl._2, "stss") match {
            case Some((s0, e0)) => stssSamples(b, s0, e0) // present-but-corrupt → None
            case None => Some(Array.tabulate(sizes.length)(_ + 1))
          })
          if sync.forall(s0 => s0 >= 1 && s0 <= sizes.length)
        } yield Mp4Track(timescale, dims._1, dims._2, deltas, sync, sizes, off)
      }

      /** First child box of type `typ` inside [from, until): returns its
        * payload bounds. size==1 → 64-bit largesize follows the type;
        * size==0 → the box runs to the container's end (§4.2).
        */
      private def mp4Child(b: Array[Byte], from: Int, until: Int,
          typ: String): Option[(Int, Int)] = {
        var i = from
        while (i + 8 <= until) {
          val sz32 = be32(b, i)
          var hdr = 8
          val size: Long =
            if (sz32 == 1) {
              if (i + 16 > until) return None
              hdr = 16
              (be32(b, i + 8).toLong << 32) | (be32(b, i + 12).toLong & 0xffffffffL)
            } else if (sz32 == 0) (until - i).toLong
            else sz32.toLong & 0xffffffffL
          if (size < hdr || size > until - i) return None // corrupt: overruns container
          if (b(i + 4) == typ.charAt(0).toByte && b(i + 5) == typ.charAt(1).toByte &&
            b(i + 6) == typ.charAt(2).toByte && b(i + 7) == typ.charAt(3).toByte)
            return Some((i + hdr, i + size.toInt))
          i += size.toInt
        }
        None
      }

      private def mdhdTimescale(b: Array[Byte], s: Int, e: Int): Option[Int] =
        if (s + 4 > e) None
        else b(s) match {
          case 0 => if (s + 16 <= e) Some(be32(b, s + 12)) else None
          case 1 => if (s + 28 <= e) Some(be32(b, s + 20)) else None
          case _ => None
        }

      // VisualSampleEntry (§12.1.3 over §8.5.2): 8-byte entry header,
      // 6 reserved + data_reference_index(2), then pre_defined/reserved
      // (16 bytes) before width(2)/height(2) at entry offsets 32/34
      private def stsdDims(b: Array[Byte], s: Int, e: Int): Option[(Int, Int)] = {
        if (s + 8 > e || be32(b, s + 4) < 1) return None
        val entry = s + 8
        if (entry + 36 > e) return None
        Some((be16(b, entry + 32), be16(b, entry + 34)))
      }

      private def sttsDeltas(b: Array[Byte], s: Int, e: Int): Option[Array[Long]] = {
        if (s + 8 > e) return None
        val count = be32(b, s + 4)
        if (count < 0 || s + 8 + 8L * count > e) return None
        val out = scala.collection.mutable.ArrayBuffer.empty[Long]
        var k = 0
        while (k < count) {
          val run = be32(b, s + 8 + 8 * k)
          val delta = be32(b, s + 12 + 8 * k).toLong & 0xffffffffL
          // a hostile run count would materialize gigabytes — bound it
          if (run < 0 || out.length + run > (1 << 20)) return None
          var r = 0
          while (r < run) { out += delta; r += 1 }
          k += 1
        }
        Some(out.toArray)
      }

      private def stszSizes(b: Array[Byte], s: Int, e: Int): Option[Array[Int]] = {
        if (s + 12 > e) return None
        val uniform = be32(b, s + 4)
        val count = be32(b, s + 8)
        if (count < 0 || count > (1 << 20)) return None
        if (uniform != 0) Some(Array.fill(count)(uniform))
        else if (s + 12 + 4L * count > e) None
        else Some(Array.tabulate(count)(k => be32(b, s + 12 + 4 * k)))
      }

      private def stssSamples(b: Array[Byte], s: Int, e: Int): Option[Array[Int]] = {
        if (s + 8 > e) return None
        val count = be32(b, s + 4)
        if (count < 0 || s + 8 + 4L * count > e) return None
        Some(Array.tabulate(count)(k => be32(b, s + 8 + 4 * k)))
      }

      private def stcoFirst(b: Array[Byte], s: Int, e: Int): Option[Long] = {
        if (s + 12 > e || be32(b, s + 4) < 1) return None
        Some(be32(b, s + 8).toLong & 0xffffffffL)
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

  /** Baseline-JPEG machinery shared by the [[MediaDecoder
    * .ContainerHeaders]] decoder and the [[MediaBuilders]] encoder —
    * ITU T.81 constants (zigzag scan order §A.3.6, the Annex K.3.3
    * typical luminance Huffman tables) and the canonical-code /
    * bit-stream plumbing both sides need. Sharing the CONSTANTS is
    * spec-fidelity, not self-confirmation: the encoder writes real
    * marker segments the decoder must re-parse from bytes, and the q96
    * oracle recomputes every decoded pixel arithmetically without
    * touching either side.
    */
  /** 64-bit block-mean perceptual hash (the aHash family — the
    * cheapest member of the pHash/dHash class used for web-scale image
    * dedup): partition the grayscale image into an 8×8 grid of equal
    * cells, bit k (row-major cell index, bit position k) = 1 iff cell
    * k's mean exceeds the global mean. Compared in ALL-INTEGER form
    * (64·cellSum > totalSum, strict) so the hash of a decoded image is
    * exact arithmetic an external oracle can replay — no float means,
    * no rounding mode. Robust to brightness-preserving re-encodes by
    * construction; Hamming distance between hashes is the near-dup
    * metric (q104).
    */
  def blockMeanHash64(px: Array[Byte], w: Int, h: Int): Long = {
    require(w % 8 == 0 && h % 8 == 0 && w > 0 && h > 0,
      s"blockMeanHash64: dims ${w}x$h must be positive multiples of 8")
    val cw = w / 8
    val ch = h / 8
    val sums = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < h) {
      val cy = y / ch
      var x = 0
      while (x < w) {
        val v = (px(y * w + x) & 0xff).toLong
        sums(cy * 8 + x / cw) += v
        total += v
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var k = 0
    while (k < 64) {
      if (64L * sums(k) > total) hash |= (1L << k)
      k += 1
    }
    hash
  }

  /** Integer box-filter downscale of packed interleaved pixels (any
    * fixed channel count: 1 = gray, 3 = RGB) by an integer factor:
    * output pixel (rx, ry) channel c = floor(mean of the aligned f×f
    * input cell) — the thumbnailing/feature-prep resize every image
    * training pipeline runs before batching. All-integer (one floor
    * division per output sample), so a decoded image's resize is exact
    * arithmetic an external oracle can replay — no float accumulation,
    * no rounding mode, no resampling kernel ambiguity. Dims must divide
    * by f (callers pick f from the source's block geometry; partial
    * edge cells would smuggle in a second, untestable weighting rule).
    * Scale: per-image O(pixels) in the same typed-map codec slot as the
    * decodes — zero shuffles at any corpus size.
    */
  def resizeBox(px: Array[Byte], w: Int, h: Int, channels: Int,
      f: Int): (Int, Int, Array[Byte]) = {
    require(channels >= 1 && px.length == w * h * channels,
      s"resizeBox: ${px.length} bytes is not ${w}x$h x$channels")
    require(f >= 1 && w % f == 0 && h % f == 0,
      s"resizeBox: factor $f must divide ${w}x$h")
    val ow = w / f
    val oh = h / f
    val area = f * f
    val out = new Array[Byte](ow * oh * channels)
    var ry = 0
    while (ry < oh) {
      var rx = 0
      while (rx < ow) {
        var c = 0
        while (c < channels) {
          var s = 0
          var dy = 0
          while (dy < f) {
            val rowBase = ((ry * f + dy) * w + rx * f) * channels + c
            var dx = 0
            while (dx < f) { s += px(rowBase + dx * channels) & 0xff; dx += 1 }
            dy += 1
          }
          out((ry * ow + rx) * channels + c) = (s / area).toByte
          c += 1
        }
        rx += 1
      }
      ry += 1
    }
    (ow, oh, out)
  }

  private[northstar] object Jpeg {

    /** Stream position k → natural (row-major) coefficient index. */
    val Zigzag: Array[Int] = Array(
      0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

    /** Annex K.3.3.1 typical luminance DC table. */
    val DcBits: Array[Int] = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    val DcVals: Array[Int] = (0 to 11).toArray

    /** Annex K.3.3.2 typical luminance AC table. */
    val AcBits: Array[Int] =
      Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
    val AcVals: Array[Int] = Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
      0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
      0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
      0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
      0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
      0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
      0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
      0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
      0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
      0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
      0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
      0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
      0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
      0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
      0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

    /** Decode-failure control flow: a malformed stream anywhere below the
      * marker walk bails the whole decode to None (stackless — thrown on
      * data, not exceptional program state).
      */
    object Bail extends scala.util.control.ControlThrowable

    /** Canonical Huffman decode table (T.81 F.2.2.3): per code LENGTH,
      * the smallest/largest code and the index of its first symbol.
      */
    final class HuffTable(val minCode: Array[Int], val maxCode: Array[Int],
        val valPtr: Array[Int], val vals: Array[Int])

    def huffTable(bits: Array[Int], vals: Array[Int]): HuffTable = {
      val minCode = new Array[Int](17)
      val maxCode = Array.fill(17)(-1)
      val valPtr = new Array[Int](17)
      var code = 0
      var k = 0
      for (len <- 1 to 16) {
        if (bits(len - 1) > 0) {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len - 1)
          k += bits(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
      }
      if (k != vals.length) throw Bail
      new HuffTable(minCode, maxCode, valPtr, vals)
    }

    /** Canonical (code, length) per symbol — the ENCODE direction. */
    def huffCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
      var code = 0
      var k = 0
      val out = Map.newBuilder[Int, (Int, Int)]
      for (len <- 1 to 16) {
        for (_ <- 0 until bits(len - 1)) {
          out += vals(k) -> (code, len)
          code += 1
          k += 1
        }
        code <<= 1
      }
      out.result()
    }

    /** Amplitude extension (T.81 F.2.2.1 EXTEND). */
    def extend(v: Int, s: Int): Int =
      if (s == 0) 0
      else if (v < (1 << (s - 1))) v - (1 << s) + 1
      else v

    /** The smallest category s with |v| < 2^s (T.81 F.1.2.1.2). */
    def category(v: Int): Int = {
      val a = math.abs(v)
      var s = 0
      while (a >= (1 << s)) s += 1
      s
    }

    /** Entropy-segment bit reader: MSB-first, 0xFF00 unstuffed, any real
      * marker mid-stream (except an expected RSTn) bails.
      */
    final class BitReader(b: Array[Byte], var pos: Int) {
      private var cur = 0
      private var nbits = 0

      def bit(): Int = {
        if (nbits == 0) {
          if (pos >= b.length) throw Bail
          var v = b(pos) & 0xff
          pos += 1
          if (v == 0xff) {
            if (pos >= b.length) throw Bail
            val nxt = b(pos) & 0xff
            if (nxt == 0) pos += 1 // stuffed data 0xFF
            else throw Bail // an unexpected real marker inside the scan
          }
          cur = v
          nbits = 8
        }
        nbits -= 1
        (cur >> nbits) & 1
      }

      def bits(n: Int): Int = {
        var v = 0
        var j = 0
        while (j < n) { v = (v << 1) | bit(); j += 1 }
        v
      }

      def decode(t: HuffTable): Int = {
        var code = bit()
        var len = 1
        while (len <= 16) {
          if (t.maxCode(len) >= 0 && code <= t.maxCode(len) &&
            code >= t.minCode(len))
            return t.vals(t.valPtr(len) + code - t.minCode(len))
          code = (code << 1) | bit()
          len += 1
        }
        throw Bail // no code of length <= 16 matched
      }

      /** Byte-align and consume the expected RSTn marker (T.81 E.1.4). */
      def expectRst(n: Int): Unit = {
        nbits = 0
        if (pos + 2 > b.length || (b(pos) & 0xff) != 0xff ||
          (b(pos + 1) & 0xff) != 0xd0 + n) throw Bail
        pos += 2
      }
    }

    private val CosTable: Array[Array[Double]] = Array.tabulate(8, 8) {
      (u, x) => math.cos((2 * x + 1) * u * math.Pi / 16.0)
    }
    private val C: Array[Double] =
      Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

    /** Definition-exact 2-D IDCT (T.81 A.3.3) of one dequantized block in
      * NATURAL order, level-shifted (+128), clamped, written into the
      * (x0, y0)-anchored window of a w×h image — partial edge blocks
      * clip. O(64²) per block: the conformance-reference kernel, not the
      * fast path (see jpegPixels' seam note).
      */
    def idctInto(coef: Array[Int], out: Array[Byte], w: Int, h: Int,
        x0: Int, y0: Int): Unit = {
      var y = 0
      while (y < 8 && y0 + y < h) {
        var x = 0
        while (x < 8 && x0 + x < w) {
          var acc = 0.0
          var v = 0
          while (v < 8) {
            var u = 0
            while (u < 8) {
              val f = coef(v * 8 + u)
              if (f != 0)
                acc += C(u) * C(v) * f * CosTable(u)(x) * CosTable(v)(y)
              u += 1
            }
            v += 1
          }
          val px = Math.round(acc / 4.0) + 128
          out((y0 + y) * w + (x0 + x)) =
            (if (px < 0) 0 else if (px > 255) 255 else px).toByte
          x += 1
        }
        y += 1
      }
    }
  }

  /** Real minimal container payloads, built byte-by-byte to spec — the
    * encode-side counterpart of [[MediaDecoder.ContainerHeaders]]. Used to
    * synthesize deterministic media fixtures that round-trip through the
    * REAL header parser (q79), so the driver's oracle checks the parse
    * path end-to-end rather than a fake. Byte lengths are closed-form in
    * the inputs (and asserted by MultimodalSpec):
    *   PNG  = 8 sig + 25 IHDR + (12+filler) tEXt + 12 IEND = 57+filler
    *   JPEG = 2 SOI + (4+filler) COM + 13 SOF0 + 2 EOI     = 21+filler
    *   WAV  = 12 RIFF/WAVE + 24 fmt + (8+filler) data      = 44+filler
    * (WAV callers pass EVEN filler so RIFF word-alignment adds no pad.)
    */
  object MediaBuilders {
    private def crc32(b: Array[Byte], from: Int, until: Int): Int = {
      val c = new java.util.zip.CRC32
      c.update(b, from, until - from)
      c.getValue.toInt
    }
    private def putBe32(b: Array[Byte], i: Int, v: Int): Unit = {
      b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
      b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
    }
    private def putLe32(b: Array[Byte], i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte
      b(i + 2) = (v >>> 16).toByte; b(i + 3) = (v >>> 24).toByte
    }
    private def putLe16(b: Array[Byte], i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte
    }
    private def putAscii(b: Array[Byte], i: Int, s: String): Unit = {
      var j = 0
      while (j < s.length) { b(i + j) = s.charAt(j).toByte; j += 1 }
    }
    /** Deterministic filler bytes so payload checksums are reproducible. */
    private def fill(b: Array[Byte], from: Int, n: Int, seed: Long): Unit = {
      var j = 0
      while (j < n) { b(from + j) = ((seed + j * 131) & 0xff).toByte; j += 1 }
    }

    /** PNG: signature, IHDR (8-bit truecolor), a tEXt chunk of `filler`
      * bytes, IEND — with real CRC32s, per RFC 2083.
      */
    def png(width: Int, height: Int, filler: Int, seed: Long): Array[Byte] = {
      require(width >= 1 && height >= 1 && filler >= 0)
      val b = new Array[Byte](57 + filler)
      putAscii(b, 1, "PNG")
      b(0) = 0x89.toByte; b(4) = 0x0d; b(5) = 0x0a; b(6) = 0x1a; b(7) = 0x0a
      putBe32(b, 8, 13); putAscii(b, 12, "IHDR")
      putBe32(b, 16, width); putBe32(b, 20, height)
      b(24) = 8; b(25) = 2 // bit depth 8, color type 2 (truecolor)
      putBe32(b, 29, crc32(b, 12, 29))
      putBe32(b, 33, filler); putAscii(b, 37, "tEXt")
      fill(b, 41, filler, seed)
      putBe32(b, 41 + filler, crc32(b, 37, 41 + filler))
      putBe32(b, 45 + filler, 0); putAscii(b, 49 + filler, "IEND")
      putBe32(b, 53 + filler, crc32(b, 49 + filler, 53 + filler))
      b
    }

    /** JPEG: SOI, a COM segment of `filler` bytes, a 1-component SOF0
      * carrying height/width, EOI — per ITU T.81 marker layout.
      */
    def jpeg(width: Int, height: Int, filler: Int, seed: Long): Array[Byte] = {
      require(width >= 1 && width <= 0xffff && height >= 1 &&
        height <= 0xffff && filler >= 0)
      val b = new Array[Byte](21 + filler)
      b(0) = 0xff.toByte; b(1) = 0xd8.toByte // SOI
      b(2) = 0xff.toByte; b(3) = 0xfe.toByte // COM
      b(4) = ((filler + 2) >>> 8).toByte; b(5) = (filler + 2).toByte
      fill(b, 6, filler, seed)
      val s = 6 + filler
      b(s) = 0xff.toByte; b(s + 1) = 0xc0.toByte // SOF0
      b(s + 2) = 0; b(s + 3) = 11 // len: 2+1+2+2+1+3 (one component)
      b(s + 4) = 8 // precision
      b(s + 5) = (height >>> 8).toByte; b(s + 6) = height.toByte
      b(s + 7) = (width >>> 8).toByte; b(s + 8) = width.toByte
      b(s + 9) = 1 // 1 component: id, sampling, quant table
      b(s + 10) = 1; b(s + 11) = 0x11; b(s + 12) = 0
      b(s + 13) = 0xff.toByte; b(s + 14) = 0xd9.toByte // EOI
      b
    }

    /** PNG with REAL pixel data: signature, IHDR (8-bit truecolor), one
      * IDAT holding the DEFLATE-compressed raw scanline stream (per-row
      * filter byte 0 + 3·width RGB bytes, RFC 2083 §2.3), IEND — all
      * CRC'd. Pixel byte j (counting pixel bytes only, row-major RGB
      * interleaved) is the same closed form as [[fill]]:
      * `(seed + j·131) & 0xff` — so a decoder's output is arithmetically
      * predictable without ever seeing the compressed bytes.
      */
    def pngWithPixels(width: Int, height: Int, seed: Long): Array[Byte] = {
      require(width >= 1 && height >= 1)
      val stride = 1 + 3 * width
      val raw = new Array[Byte](height * stride)
      var j = 0
      var r = 0
      while (r < raw.length) {
        if (r % stride == 0) raw(r) = 0 // filter type 0 (None)
        else { raw(r) = ((seed + j * 131) & 0xff).toByte; j += 1 }
        r += 1
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val buf = new Array[Byte](raw.length + 64)
      val n = deflater.deflate(buf)
      require(deflater.finished(), "pngWithPixels: deflate buffer too small")
      deflater.end()
      val b = new Array[Byte](57 + n)
      putAscii(b, 1, "PNG")
      b(0) = 0x89.toByte; b(4) = 0x0d; b(5) = 0x0a; b(6) = 0x1a; b(7) = 0x0a
      putBe32(b, 8, 13); putAscii(b, 12, "IHDR")
      putBe32(b, 16, width); putBe32(b, 20, height)
      b(24) = 8; b(25) = 2 // bit depth 8, color type 2 (truecolor)
      putBe32(b, 29, crc32(b, 12, 29))
      putBe32(b, 33, n); putAscii(b, 37, "IDAT")
      System.arraycopy(buf, 0, b, 41, n)
      putBe32(b, 41 + n, crc32(b, 37, 41 + n))
      putBe32(b, 45 + n, 0); putAscii(b, 49 + n, "IEND")
      putBe32(b, 53 + n, crc32(b, 49 + n, 53 + n))
      b
    }

    /** Baseline grayscale JPEG with REAL entropy-coded pixel data — the
      * encode-side counterpart of [[MediaDecoder.ContainerHeaders
      * .jpegPixels]], per ITU T.81: SOI, an 8-bit DQT, SOF0 (one
      * component, 1×1 sampling), the Annex K typical-luminance DC and AC
      * Huffman tables as real DHT segments, SOS, then the
      * Huffman-entropy-coded scan (DC differences + amplitude bits, EOB
      * per block, 0xFF byte stuffing, 1-padded flush), EOI.
      *
      * `dcs(k)` is block k's QUANTIZED DC value (row-major blocks); all
      * AC coefficients are zero, so each decoded 8×8 block is FLAT at
      * clamp(round(dcs(k)·Q00/8) + 128) — with the default `qdc = 8`
      * exactly dcs(k) + 128, closed-form arithmetic a DuckDB oracle can
      * replay without touching the compressed bytes (the q91 pattern for
      * the DCT path). The decoder still exercises the full real
      * pipeline — marker parse, DHT build, bit unstuffing, DC
      * prediction, dequant, IDCT — on these bytes.
      */
    def jpegBaseline(width: Int, height: Int, dcs: Array[Int],
        qdc: Int = 8, restartEvery: Int = 0): Array[Byte] = {
      require(width >= 8 && height >= 8 && width % 8 == 0 && height % 8 == 0,
        s"jpegBaseline: dims ${width}x$height must be positive multiples of 8")
      val bx = width / 8
      val by = height / 8
      require(dcs.length == bx * by,
        s"jpegBaseline: ${dcs.length} DCs for ${bx * by} blocks")
      require(qdc >= 1 && qdc <= 255, s"jpegBaseline: qdc=$qdc out of range")
      require(dcs.forall(d => math.abs(d) <= 1023),
        "jpegBaseline: |dc| must stay within category 11 after differencing")
      val out = new java.io.ByteArrayOutputStream()
      def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
      def be16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
      marker(0xd8) // SOI
      marker(0xdb); be16(2 + 1 + 64) // DQT, 8-bit table 0
      out.write(0x00)
      out.write(qdc) // Q[0] in stream (zigzag) order; rest flat 16
      for (_ <- 1 until 64) out.write(16)
      marker(0xc0); be16(11) // SOF0: precision, dims, 1 component
      out.write(8); be16(height); be16(width); out.write(1)
      out.write(1); out.write(0x11); out.write(0) // id, 1x1, qtable 0
      if (restartEvery > 0) { marker(0xdd); be16(4); be16(restartEvery) }
      def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit = {
        marker(0xc4); be16(2 + 1 + 16 + vals.length)
        out.write(cls)
        bits.foreach(out.write)
        vals.foreach(out.write)
      }
      dht(0x00, Jpeg.DcBits, Jpeg.DcVals)
      dht(0x10, Jpeg.AcBits, Jpeg.AcVals)
      marker(0xda); be16(8) // SOS: 1 component, tables 0/0, full spectral
      out.write(1); out.write(1); out.write(0x00)
      out.write(0); out.write(63); out.write(0)
      // the entropy-coded scan, with byte stuffing
      val dcCodes = Jpeg.huffCodes(Jpeg.DcBits, Jpeg.DcVals)
      val acCodes = Jpeg.huffCodes(Jpeg.AcBits, Jpeg.AcVals)
      var acc = 0
      var nbits = 0
      def putBits(code: Int, len: Int): Unit = {
        var j = len - 1
        while (j >= 0) {
          acc = (acc << 1) | ((code >> j) & 1)
          nbits += 1
          if (nbits == 8) {
            out.write(acc)
            if (acc == 0xff) out.write(0x00) // stuffing
            acc = 0; nbits = 0
          }
          j -= 1
        }
      }
      def flush1Padded(): Unit = if (nbits > 0) { // T.81 F.1.2.3
        val pad = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
        out.write(pad)
        if (pad == 0xff) out.write(0x00)
        acc = 0; nbits = 0
      }
      var pred = 0
      var rstN = 0
      for ((dc, mcu) <- dcs.zipWithIndex) {
        if (restartEvery > 0 && mcu > 0 && mcu % restartEvery == 0) {
          flush1Padded() // restart intervals are byte-aligned (E.1.4)
          marker(0xd0 + rstN)
          rstN = (rstN + 1) % 8
          pred = 0
        }
        val diff = dc - pred
        pred = dc
        val s = Jpeg.category(diff)
        val (c, l) = dcCodes(s)
        putBits(c, l)
        if (s > 0)
          putBits(if (diff >= 0) diff else diff + (1 << s) - 1, s)
        val (ec, el) = acCodes(0x00) // EOB — all AC zero
        putBits(ec, el)
      }
      flush1Padded()
      marker(0xd9) // EOI
      out.toByteArray
    }

    /** Baseline COLOR (3-component YCbCr, 4:4:4) JPEG with real
      * entropy-coded data — [[jpegBaseline]]'s color sibling: one DQT
      * shared by all components, SOF0 with three 1×1-sampled components,
      * the Annex K tables for every (DC, AC) pair, and an interleaved
      * scan (per MCU: one Y, one Cb, one Cr block, per-component DC
      * predictors). Per-channel quantized DCs per block; all AC zero, so
      * each decoded 8×8 block is flat at (dc + 128) per channel BEFORE
      * color conversion — with the integer fixed-point YCbCr→RGB of
      * [[MediaDecoder.ContainerHeaders.jpegRgbPixels]], every RGB pixel
      * is closed-form integer arithmetic (the q99 oracle).
      */
    def jpegBaselineColor(width: Int, height: Int, yDcs: Array[Int],
        cbDcs: Array[Int], crDcs: Array[Int], qdc: Int = 8): Array[Byte] = {
      require(width >= 8 && height >= 8 && width % 8 == 0 && height % 8 == 0,
        s"jpegBaselineColor: dims ${width}x$height must be multiples of 8")
      val nb = (width / 8) * (height / 8)
      require(yDcs.length == nb && cbDcs.length == nb && crDcs.length == nb,
        s"jpegBaselineColor: need $nb DCs per channel")
      require(qdc >= 1 && qdc <= 255)
      require((yDcs ++ cbDcs ++ crDcs).forall(d => math.abs(d) <= 1023))
      val out = new java.io.ByteArrayOutputStream()
      def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
      def be16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
      marker(0xd8)
      marker(0xdb); be16(2 + 1 + 64)
      out.write(0x00); out.write(qdc)
      for (_ <- 1 until 64) out.write(16)
      marker(0xc0); be16(8 + 3 * 3) // SOF0, 3 components
      out.write(8); be16(height); be16(width); out.write(3)
      for (cid <- 1 to 3) {
        out.write(cid); out.write(0x11); out.write(0) // 1x1, qtable 0
      }
      def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit = {
        marker(0xc4); be16(2 + 1 + 16 + vals.length)
        out.write(cls); bits.foreach(out.write); vals.foreach(out.write)
      }
      dht(0x00, Jpeg.DcBits, Jpeg.DcVals)
      dht(0x10, Jpeg.AcBits, Jpeg.AcVals)
      marker(0xda); be16(6 + 2 * 3)
      out.write(3)
      for (cid <- 1 to 3) { out.write(cid); out.write(0x00) } // tables 0/0
      out.write(0); out.write(63); out.write(0)
      val dcCodes = Jpeg.huffCodes(Jpeg.DcBits, Jpeg.DcVals)
      val acCodes = Jpeg.huffCodes(Jpeg.AcBits, Jpeg.AcVals)
      var acc = 0
      var nbits = 0
      def putBits(code: Int, len: Int): Unit = {
        var j = len - 1
        while (j >= 0) {
          acc = (acc << 1) | ((code >> j) & 1)
          nbits += 1
          if (nbits == 8) {
            out.write(acc)
            if (acc == 0xff) out.write(0x00)
            acc = 0; nbits = 0
          }
          j -= 1
        }
      }
      val preds = new Array[Int](3)
      val chans = Array(yDcs, cbDcs, crDcs)
      for (k <- 0 until nb; c <- 0 until 3) {
        val diff = chans(c)(k) - preds(c)
        preds(c) = chans(c)(k)
        val s = Jpeg.category(diff)
        val (cc, l) = dcCodes(s)
        putBits(cc, l)
        if (s > 0)
          putBits(if (diff >= 0) diff else diff + (1 << s) - 1, s)
        val (ec, el) = acCodes(0x00)
        putBits(ec, el)
      }
      if (nbits > 0) {
        val pad = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
        out.write(pad)
        if (pad == 0xff) out.write(0x00)
      }
      marker(0xd9)
      out.toByteArray
    }

    /** Progressive-scan AC Huffman table for the fixture builders: the
      * 15 EOBn run-length symbols (RRRR|0, r = 0..14 — T.81 G.1.2.2),
      * each a 4-bit code; the all-ones code stays unused (C.2).
      */
    private val ProgAcBits: Array[Int] =
      Array(0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    private val ProgAcVals: Array[Int] = Array.tabulate(15)(r => r << 4)

    /** PROGRESSIVE grayscale JPEG (SOF2) with real multi-scan entropy
      * data — the encode-side counterpart of the T.81 Annex G decode
      * path, exercising every progressive scan kind on bytes whose final
      * coefficients are still closed-form: a DC-FIRST scan at Al=1
      * (differential coding of the point-transformed `dc >> 1`), two
      * AC-FIRST scans splitting the spectrum (bands [1,5] and [6,63],
      * all-zero coefficients coded as real EOBn RUN-LENGTH codes — the
      * (1<<r)+extra-bits form, segmented at restart boundaries), and a
      * DC-REFINEMENT scan (Ah=1, one raw bit per block = `dc & 1`).
      * Because arithmetic-shift point transform + OR-refinement is exact
      * in two's complement, the reconstructed DC is `dcs(k)` exactly and
      * every AC is zero, so each decoded block is flat at dc+128 with
      * the default q — the q96 closed-form-oracle discipline carried
      * through the whole progressive machinery (q102). `restartEvery`
      * additionally exercises predictor/EOB-run resets in BOTH scan
      * kinds.
      */
    def jpegProgressive(width: Int, height: Int, dcs: Array[Int],
        qdc: Int = 8, restartEvery: Int = 0): Array[Byte] = {
      require(width >= 8 && height >= 8 && width % 8 == 0 && height % 8 == 0,
        s"jpegProgressive: dims ${width}x$height must be multiples of 8")
      val bx = width / 8
      val by = height / 8
      require(dcs.length == bx * by,
        s"jpegProgressive: ${dcs.length} DCs for ${bx * by} blocks")
      require(qdc >= 1 && qdc <= 255)
      require(dcs.forall(d => math.abs(d) <= 1023))
      val out = new java.io.ByteArrayOutputStream()
      def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
      def be16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
      marker(0xd8) // SOI
      marker(0xdb); be16(2 + 1 + 64)
      out.write(0x00); out.write(qdc)
      for (_ <- 1 until 64) out.write(16)
      marker(0xc2); be16(11) // SOF2: same frame header shape as SOF0
      out.write(8); be16(height); be16(width); out.write(1)
      out.write(1); out.write(0x11); out.write(0)
      if (restartEvery > 0) { marker(0xdd); be16(4); be16(restartEvery) }
      def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit = {
        marker(0xc4); be16(2 + 1 + 16 + vals.length)
        out.write(cls); bits.foreach(out.write); vals.foreach(out.write)
      }
      dht(0x00, Jpeg.DcBits, Jpeg.DcVals)
      // EOBn symbols (RRRR|0, r = 0..14) are PROGRESSIVE-ONLY codes the
      // Annex K baseline AC table does not carry — a custom table, all
      // 15 at length 4 (the all-ones code stays unused per T.81 C.2)
      dht(0x10, ProgAcBits, ProgAcVals)
      val dcCodes = Jpeg.huffCodes(Jpeg.DcBits, Jpeg.DcVals)
      val acCodes = Jpeg.huffCodes(ProgAcBits, ProgAcVals)
      var acc = 0
      var nbits = 0
      def putBits(code: Int, len: Int): Unit = {
        var j = len - 1
        while (j >= 0) {
          acc = (acc << 1) | ((code >> j) & 1)
          nbits += 1
          if (nbits == 8) {
            out.write(acc)
            if (acc == 0xff) out.write(0x00)
            acc = 0; nbits = 0
          }
          j -= 1
        }
      }
      def flush1Padded(): Unit = if (nbits > 0) {
        val pad = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
        out.write(pad)
        if (pad == 0xff) out.write(0x00)
        acc = 0; nbits = 0
      }
      var rstN = 0
      def rst(): Unit = {
        flush1Padded()
        marker(0xd0 + rstN)
        rstN = (rstN + 1) % 8
      }
      def sos(ss: Int, se: Int, ah: Int, al: Int): Unit = {
        marker(0xda); be16(8)
        out.write(1); out.write(1); out.write(0x00)
        out.write(ss); out.write(se); out.write((ah << 4) | al)
      }
      def segments[A](xs: Seq[A]): Seq[Seq[A]] =
        if (restartEvery <= 0) Seq(xs)
        else xs.grouped(restartEvery).toSeq
      // scan 1: DC first, Al=1 — differential code of dc >> 1
      sos(0, 0, 0, 1)
      rstN = 0
      for ((segDcs, si) <- segments(dcs.toSeq.map(_ >> 1)).zipWithIndex) {
        if (si > 0) rst()
        var pred = 0
        for (dc <- segDcs) {
          val diff = dc - pred
          pred = dc
          val s = Jpeg.category(diff)
          val (c, l) = dcCodes(s)
          putBits(c, l)
          if (s > 0)
            putBits(if (diff >= 0) diff else diff + (1 << s) - 1, s)
        }
      }
      flush1Padded()
      // one EOBn run-length code covering n all-zero blocks (n <= 32767)
      def putEobRun(n: Int): Unit = {
        require(n >= 1 && n <= 32767)
        val r = 31 - Integer.numberOfLeadingZeros(n)
        val (c, l) = acCodes(r << 4)
        putBits(c, l)
        if (r > 0) putBits(n - (1 << r), r)
      }
      // scans 2+3: AC first over split bands, all-zero via EOB runs
      for ((ss, se) <- Seq((1, 5), (6, 63))) {
        sos(ss, se, 0, 0)
        rstN = 0
        for ((seg, si) <- segments(dcs.indices).zipWithIndex) {
          if (si > 0) rst()
          putEobRun(seg.length)
        }
        flush1Padded()
      }
      // scan 4: DC refinement, Ah=1 Al=0 — raw bit = dc & 1 per block
      sos(0, 0, 1, 0)
      rstN = 0
      for ((seg, si) <- segments(dcs.toSeq).zipWithIndex) {
        if (si > 0) rst()
        for (dc <- seg) putBits(dc & 1, 1)
      }
      flush1Padded()
      marker(0xd9)
      out.toByteArray
    }

    /** PROGRESSIVE COLOR (3-component YCbCr 4:4:4) JPEG —
      * [[jpegProgressive]]'s color sibling with the canonical progressive
      * scan script shape: an INTERLEAVED DC-first scan (ns=3, per-MCU
      * per-component predictors, Al=1), per-component non-interleaved
      * AC-first scans over [1,63] (EOB runs), and an interleaved
      * DC-refinement scan. Final coefficients are the per-channel DCs
      * exactly, so every RGB pixel is the q99 closed-form integer
      * arithmetic (the q102 oracle).
      */
    def jpegProgressiveColor(width: Int, height: Int, yDcs: Array[Int],
        cbDcs: Array[Int], crDcs: Array[Int], qdc: Int = 8): Array[Byte] = {
      require(width >= 8 && height >= 8 && width % 8 == 0 && height % 8 == 0,
        s"jpegProgressiveColor: dims ${width}x$height must be multiples of 8")
      val nb = (width / 8) * (height / 8)
      require(yDcs.length == nb && cbDcs.length == nb && crDcs.length == nb,
        s"jpegProgressiveColor: need $nb DCs per channel")
      require(qdc >= 1 && qdc <= 255)
      require((yDcs ++ cbDcs ++ crDcs).forall(d => math.abs(d) <= 1023))
      val out = new java.io.ByteArrayOutputStream()
      def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
      def be16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
      marker(0xd8)
      marker(0xdb); be16(2 + 1 + 64)
      out.write(0x00); out.write(qdc)
      for (_ <- 1 until 64) out.write(16)
      marker(0xc2); be16(8 + 3 * 3) // SOF2, 3 components, 1x1 sampling
      out.write(8); be16(height); be16(width); out.write(3)
      for (cid <- 1 to 3) { out.write(cid); out.write(0x11); out.write(0) }
      def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit = {
        marker(0xc4); be16(2 + 1 + 16 + vals.length)
        out.write(cls); bits.foreach(out.write); vals.foreach(out.write)
      }
      dht(0x00, Jpeg.DcBits, Jpeg.DcVals)
      dht(0x10, ProgAcBits, ProgAcVals) // EOBn symbols (see jpegProgressive)
      val dcCodes = Jpeg.huffCodes(Jpeg.DcBits, Jpeg.DcVals)
      val acCodes = Jpeg.huffCodes(ProgAcBits, ProgAcVals)
      var acc = 0
      var nbits = 0
      def putBits(code: Int, len: Int): Unit = {
        var j = len - 1
        while (j >= 0) {
          acc = (acc << 1) | ((code >> j) & 1)
          nbits += 1
          if (nbits == 8) {
            out.write(acc)
            if (acc == 0xff) out.write(0x00)
            acc = 0; nbits = 0
          }
          j -= 1
        }
      }
      def flush1Padded(): Unit = if (nbits > 0) {
        val pad = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
        out.write(pad)
        if (pad == 0xff) out.write(0x00)
        acc = 0; nbits = 0
      }
      val chans = Array(yDcs, cbDcs, crDcs)
      // scan 1: interleaved DC first, Al=1
      marker(0xda); be16(6 + 2 * 3)
      out.write(3)
      for (cid <- 1 to 3) { out.write(cid); out.write(0x00) }
      out.write(0); out.write(0); out.write(0x01) // Ss=0 Se=0 Ah=0 Al=1
      val preds = new Array[Int](3)
      for (k <- 0 until nb; c <- 0 until 3) {
        val v = chans(c)(k) >> 1
        val diff = v - preds(c)
        preds(c) = v
        val s = Jpeg.category(diff)
        val (cc, l) = dcCodes(s)
        putBits(cc, l)
        if (s > 0)
          putBits(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      }
      flush1Padded()
      // scans 2-4: per-component AC first over [1,63], all-zero EOB run
      for (cid <- 1 to 3) {
        marker(0xda); be16(8)
        out.write(1); out.write(cid); out.write(0x00)
        out.write(1); out.write(63); out.write(0x00)
        val r = 31 - Integer.numberOfLeadingZeros(nb)
        val (c, l) = acCodes(r << 4)
        putBits(c, l)
        if (r > 0) putBits(nb - (1 << r), r)
        flush1Padded()
      }
      // scan 5: interleaved DC refinement, Ah=1 Al=0 — raw bits
      marker(0xda); be16(6 + 2 * 3)
      out.write(3)
      for (cid <- 1 to 3) { out.write(cid); out.write(0x00) }
      out.write(0); out.write(0); out.write(0x10) // Ah=1 Al=0
      for (k <- 0 until nb; c <- 0 until 3) putBits(chans(c)(k) & 1, 1)
      flush1Padded()
      marker(0xd9)
      out.toByteArray
    }

    /** WAV: RIFF/WAVE header, 16-byte PCM `fmt ` chunk, a `data` chunk of
      * `filler` bytes. `filler` must be even (RIFF word alignment).
      */
    def wav(sampleRate: Int, channels: Int, bitsPerSample: Int, filler: Int,
        seed: Long): Array[Byte] = {
      require(sampleRate >= 1 && channels >= 1 && filler >= 0 &&
        filler % 2 == 0, s"filler=$filler must be even")
      val b = new Array[Byte](44 + filler)
      putAscii(b, 0, "RIFF"); putLe32(b, 4, 36 + filler)
      putAscii(b, 8, "WAVE"); putAscii(b, 12, "fmt "); putLe32(b, 16, 16)
      putLe16(b, 20, 1) // PCM
      putLe16(b, 22, channels); putLe32(b, 24, sampleRate)
      putLe32(b, 28, sampleRate * channels * (bitsPerSample / 8))
      putLe16(b, 32, channels * (bitsPerSample / 8))
      putLe16(b, 34, bitsPerSample)
      putAscii(b, 36, "data"); putLe32(b, 40, filler)
      fill(b, 44, filler, seed)
      b
    }

    /** ISO-BMFF (MP4) with a REAL sample table, per ISO/IEC 14496-12:
      * `ftyp`, `moov(mvhd, trak(tkhd, mdia(mdhd, hdlr, minf(stbl(stsd
      * avc1, stts, stss, stsz, stco)))))`, `mdat`. mvhd/mdhd alternate
      * FullBox version 0/1 by id parity so both the 32- and 64-bit field
      * layouts are exercised; `stco`'s single chunk offset points at the
      * mdat payload, whose bytes are the [[fill]] closed form — so sample
      * offsets, sizes, timestamps AND payload checksums are all
      * arithmetically predictable from `id` alone ([[Multimodal
      * .VideoParams]] is the single source of truth the q106 oracle
      * mirrors). stco depends on moov's own length; every field is
      * fixed-width given the id, so building moov twice (placeholder
      * offset, then the real one) converges.
      */
    def mp4(id: Long): Array[Byte] = {
      import java.io.ByteArrayOutputStream
      import Multimodal.{VideoParams => V}
      require(id >= 0, s"mp4: id=$id must be >= 0")
      val n = V.nSamples(id)
      val n1 = V.firstRun(id)
      val sizes = Array.tabulate(n)(i => V.sampleSize(id, i))
      val ts = V.timescale(id)
      val durUnits = n1 * V.delta1(id) + (n - n1) * V.delta2(id)
      val vMvhd = (id % 2).toInt
      val vMdhd = ((id / 2) % 2).toInt
      def boxBytes(tag: String)(body: ByteArrayOutputStream => Unit): Array[Byte] = {
        val o = new ByteArrayOutputStream
        body(o)
        val p = o.toByteArray
        val out = new Array[Byte](8 + p.length)
        putBe32(out, 0, 8 + p.length); putAscii(out, 4, tag)
        System.arraycopy(p, 0, out, 8, p.length)
        out
      }
      def be32o(o: ByteArrayOutputStream, v: Int): Unit = {
        o.write((v >>> 24) & 0xff); o.write((v >>> 16) & 0xff)
        o.write((v >>> 8) & 0xff); o.write(v & 0xff)
      }
      def be64o(o: ByteArrayOutputStream, v: Long): Unit = {
        be32o(o, (v >>> 32).toInt); be32o(o, v.toInt)
      }
      def be16o(o: ByteArrayOutputStream, v: Int): Unit = {
        o.write((v >>> 8) & 0xff); o.write(v & 0xff)
      }
      def tago(o: ByteArrayOutputStream, t: String): Unit = {
        var j = 0
        while (j < t.length) { o.write(t.charAt(j).toInt & 0xff); j += 1 }
      }
      def fullHdr(o: ByteArrayOutputStream, version: Int): Unit = {
        o.write(version); o.write(0); o.write(0); o.write(0)
      }
      val unityMatrix = Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
      val ftyp = boxBytes("ftyp") { o =>
        tago(o, "isom"); be32o(o, 0x200); tago(o, "mp42")
      }
      def moov(chunkOffset: Long): Array[Byte] = boxBytes("moov") { mo =>
        mo.write(boxBytes("mvhd") { o =>
          fullHdr(o, vMvhd)
          if (vMvhd == 1) { be64o(o, 0L); be64o(o, 0L); be32o(o, ts); be64o(o, durUnits) }
          else { be32o(o, 0); be32o(o, 0); be32o(o, ts); be32o(o, durUnits.toInt) }
          be32o(o, 0x00010000); be16o(o, 0x0100); be16o(o, 0) // rate, volume
          be32o(o, 0); be32o(o, 0) // reserved
          unityMatrix.foreach(be32o(o, _))
          (0 until 6).foreach(_ => be32o(o, 0)) // pre_defined
          be32o(o, 2) // next_track_ID
        })
        mo.write(boxBytes("trak") { tr =>
          tr.write(boxBytes("tkhd") { o =>
            fullHdr(o, 0)
            be32o(o, 0); be32o(o, 0); be32o(o, 1) // created, modified, track_ID
            be32o(o, 0); be32o(o, 0) // reserved, duration
            be32o(o, 0); be32o(o, 0) // reserved
            be16o(o, 0); be16o(o, 0); be16o(o, 0); be16o(o, 0)
            unityMatrix.foreach(be32o(o, _))
            be32o(o, V.width(id) << 16); be32o(o, V.height(id) << 16)
          })
          tr.write(boxBytes("mdia") { md =>
            md.write(boxBytes("mdhd") { o =>
              fullHdr(o, vMdhd)
              if (vMdhd == 1) { be64o(o, 0L); be64o(o, 0L); be32o(o, ts); be64o(o, durUnits) }
              else { be32o(o, 0); be32o(o, 0); be32o(o, ts); be32o(o, durUnits.toInt) }
              be16o(o, 0x55c4); be16o(o, 0) // language 'und', pre_defined
            })
            md.write(boxBytes("hdlr") { o =>
              fullHdr(o, 0); be32o(o, 0); tago(o, "vide")
              (0 until 3).foreach(_ => be32o(o, 0)); o.write(0) // name ""
            })
            md.write(boxBytes("minf") { mi =>
              mi.write(boxBytes("stbl") { st =>
                st.write(boxBytes("stsd") { o =>
                  fullHdr(o, 0); be32o(o, 1)
                  // one 86-byte VisualSampleEntry, no codec-config child
                  be32o(o, 86); tago(o, "avc1")
                  (0 until 6).foreach(_ => o.write(0)); be16o(o, 1)
                  be16o(o, 0); be16o(o, 0)
                  (0 until 3).foreach(_ => be32o(o, 0))
                  be16o(o, V.width(id)); be16o(o, V.height(id))
                  be32o(o, 0x00480000); be32o(o, 0x00480000); be32o(o, 0)
                  be16o(o, 1) // frame_count
                  (0 until 32).foreach(_ => o.write(0)) // compressorname
                  be16o(o, 24); be16o(o, 0xffff) // depth, pre_defined
                })
                st.write(boxBytes("stts") { o =>
                  fullHdr(o, 0); be32o(o, 2)
                  be32o(o, n1); be32o(o, V.delta1(id).toInt)
                  be32o(o, n - n1); be32o(o, V.delta2(id).toInt)
                })
                st.write(boxBytes("stss") { o =>
                  val kfs = 1 to n by V.kfInterval(id)
                  fullHdr(o, 0); be32o(o, kfs.size)
                  kfs.foreach(be32o(o, _))
                })
                st.write(boxBytes("stsz") { o =>
                  fullHdr(o, 0); be32o(o, 0); be32o(o, n)
                  sizes.foreach(be32o(o, _))
                })
                st.write(boxBytes("stco") { o =>
                  fullHdr(o, 0); be32o(o, 1); be32o(o, chunkOffset.toInt)
                })
              })
            })
          })
        })
      }
      val moovLen = moov(0L).length
      val mdatPayload = sizes.sum
      val dataOff = ftyp.length + moovLen + 8L
      val m = moov(dataOff)
      require(m.length == moovLen, "mp4: moov length changed with offset")
      val out = new Array[Byte](ftyp.length + moovLen + 8 + mdatPayload)
      System.arraycopy(ftyp, 0, out, 0, ftyp.length)
      System.arraycopy(m, 0, out, ftyp.length, moovLen)
      putBe32(out, ftyp.length + moovLen, 8 + mdatPayload)
      putAscii(out, ftyp.length + moovLen + 4, "mdat")
      fill(out, ftyp.length + moovLen + 8, mdatPayload, id)
      out
    }
  }

  /** Closed-form parameters of the synthetic MP4 corpus — the single
    * source of truth for [[MediaBuilders.mp4]], the q106 query and its
    * DuckDB oracle (which mirrors every formula verbatim). The first
    * `firstRun(id)` samples last `delta1(id)` timescale units each, the
    * rest `delta2(id)`; sync samples sit at 1, 1+kfInterval, …
    */
  object VideoParams {
    val Timescales: Array[Int] = Array(600, 1000, 12288, 90000)
    def nSamples(id: Long): Int = 6 + (id % 7).toInt
    def kfInterval(id: Long): Int = 2 + (id % 3).toInt
    def timescale(id: Long): Int = Timescales((id % 4).toInt)
    def delta1(id: Long): Long = 1 + id % 100
    def delta2(id: Long): Long = 2 * delta1(id)
    def firstRun(id: Long): Int = nSamples(id) / 2
    def sampleSize(id: Long, i: Int): Int = 16 + ((id * 5 + i * 7) % 48).toInt
    def width(id: Long): Int = 160 + (id % 8).toInt * 80
    def height(id: Long): Int = 90 + (id % 8).toInt * 45
  }

  /** Deterministic synthetic media over the documents table: each doc_id
    * maps (closed-form — mirrored verbatim by the q79 DuckDB oracle) to a
    * REAL PNG/JPEG/WAV container built by [[MediaBuilders]]. The typed map
    * is executor-side byte assembly — the same genuinely-imperative-codec
    * case as [[extractFeatures]]; everything around it stays columnar.
    */
  def syntheticMediaFromDocs(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      val filler = (2 * (id % 32)).toInt
      val w = (16 + (id * 7) % 1200).toInt
      val h = (16 + (id * 13) % 900).toInt
      val sr = (id % 4).toInt match {
        case 0 => 8000; case 1 => 16000; case 2 => 22050; case _ => 44100
      }
      val ch = (1 + id % 2).toInt
      (id % 3).toInt match {
        case 0 => MediaRow(id, MediaBuilders.png(w, h, filler, id),
          MediaMeta("png", w, h, 0, 0L))
        case 1 => MediaRow(id, MediaBuilders.jpeg(w, h, filler, id),
          MediaMeta("jpeg", w, h, 0, 0L))
        case _ => MediaRow(id, MediaBuilders.wav(sr, ch, 16, filler, id),
          MediaMeta("wav", 0, 0, sr,
            // duration of `filler` PCM bytes at sr·ch·2 bytes/sec
            filler * 1000L / (sr.toLong * ch * 2)))
      }
    }
  }

  /** Deterministic synthetic MP4 corpus over the documents table — every
    * doc_id maps to a REAL ISO-BMFF container ([[MediaBuilders.mp4]])
    * whose sample table is closed-form in the id ([[VideoParams]]).
    * Separate from [[syntheticMediaFromDocs]] so the q79 oracle's id%3
    * kind mapping stays untouched.
    */
  def syntheticVideosFromDocs(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      val n = VideoParams.nSamples(id)
      val n1 = VideoParams.firstRun(id)
      val units = n1 * VideoParams.delta1(id) + (n - n1) * VideoParams.delta2(id)
      MediaRow(id, MediaBuilders.mp4(id),
        MediaMeta("mp4", VideoParams.width(id), VideoParams.height(id), 0,
          units * 1000L / VideoParams.timescale(id)))
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
    * PNG/JPEG headers (and fully decodes PNG pixels, PCM samples and
    * baseline JPEG pixels for the content-level features q90/q91/q96
    * build), [[MediaDecoder.Fake]] is the deterministic test double, and
    * a production deployment binds a full codec library at the same seam
    * for the formats this container's pure-JVM decoders do not claim.
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
