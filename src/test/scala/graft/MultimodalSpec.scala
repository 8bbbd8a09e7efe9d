package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.northstar.Multimodal

/** Multimodal binary-column plumbing over synthesized payloads. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def media = Multimodal.packFromText(
    Tables.read(spark, dir, "documents").limit(50), "doc_id", "text")

  test("pack produces binary payloads with typed metadata") {
    val rows = media.collect()
    assert(rows.length == 50)
    assert(rows.forall(_.payload.nonEmpty))
    assert(rows.map(_.meta.kind).toSet.subsetOf(Set("image", "audio", "video")))
  }

  test("feature extraction: histogram mass equals payload size, deterministic") {
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.forall(f => f.byte_histogram.sum == f.n_bytes))
    val again = Multimodal.extractFeatures(media).collect()
    assert(feats.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
  }

  test("ContainerHeaders reads real dimensions from handcrafted PNG/JPEG headers") {
    import Multimodal.MediaDecoder.ContainerHeaders
    // minimal PNG: 8-byte signature, IHDR length, "IHDR", width=640, height=480
    val png = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, // signature
      0x00, 0x00, 0x00, 0x0d, 'I', 'H', 'D', 'R',                   // len + type
      0x00, 0x00, 0x02, 0x80,                                       // width 640
      0x00, 0x00, 0x01, 0xe0,                                       // height 480
      0x08, 0x06, 0x00, 0x00, 0x00).map(_.toByte)
    assert(ContainerHeaders.dimensions(png).contains((640, 480)))
    // minimal JPEG: SOI, APP0 segment (skipped), SOF0 with height=120 width=320
    val jpeg = Array(0xff, 0xd8,                                     // SOI
      0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46,                           // APP0 len 4
      0xff, 0xc0, 0x00, 0x11, 0x08,                                 // SOF0 len 17, prec 8
      0x00, 0x78,                                                   // height 120
      0x01, 0x40,                                                   // width 320
      0x03, 0x01, 0x22, 0x00).map(_.toByte)
    assert(ContainerHeaders.dimensions(jpeg).contains((320, 120)))
    // non-image payloads decode to None, not garbage
    assert(ContainerHeaders.dimensions("plain text".getBytes).isEmpty)
    assert(ContainerHeaders.dimensions(Array[Byte]()).isEmpty)
    assert(ContainerHeaders.dimensions(png.take(20)).isEmpty)
  }

  test("ContainerHeaders reads WAV sample format from a handcrafted RIFF header") {
    import Multimodal.MediaDecoder.ContainerHeaders
    def le16(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff)
    def le32(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff,
      (v >> 24) & 0xff)
    // RIFF/WAVE with a JUNK chunk before fmt — the walker must skip it
    // (odd-sized, so word-alignment padding is exercised too)
    val wav = (Seq('R', 'I', 'F', 'F').map(_.toInt) ++ le32(64) ++
      Seq('W', 'A', 'V', 'E').map(_.toInt) ++
      Seq('J', 'U', 'N', 'K').map(_.toInt) ++ le32(3) ++
      Seq(0, 0, 0, 0) ++ // 3 junk bytes + 1 alignment pad
      Seq('f', 'm', 't', ' ').map(_.toInt) ++ le32(16) ++
      le16(1) ++ le16(2) ++ le32(44100) ++ le32(176400) ++
      le16(4) ++ le16(16)).map(_.toByte).toArray
    val got = ContainerHeaders.audioFormat(wav)
    assert(got.contains(Multimodal.AudioFormat(44100, 2, 16)))
    // non-audio payloads decode to None, not garbage
    assert(ContainerHeaders.audioFormat("plain text".getBytes).isEmpty)
    assert(ContainerHeaders.audioFormat(wav.take(16)).isEmpty)
    assert(ContainerHeaders.dimensions(wav).isEmpty)
  }

  test("ContainerHeaders decodes 16-bit PCM samples: sign extension, JUNK " +
      "skip, odd trailing byte, non-16-bit refusal") {
    import Multimodal.MediaDecoder.ContainerHeaders
    def le16(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff)
    def le32(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff,
      (v >> 24) & 0xff)
    def wavWith(bits: Int, dataBytes: Seq[Int]) =
      (Seq('R', 'I', 'F', 'F').map(_.toInt) ++ le32(64) ++
        Seq('W', 'A', 'V', 'E').map(_.toInt) ++
        Seq('J', 'U', 'N', 'K').map(_.toInt) ++ le32(3) ++
        Seq(0, 0, 0, 0) ++
        Seq('f', 'm', 't', ' ').map(_.toInt) ++ le32(16) ++
        le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++
        le16(2) ++ le16(bits) ++
        Seq('d', 'a', 't', 'a').map(_.toInt) ++ le32(dataBytes.length) ++
        dataBytes).map(_.toByte).toArray
    // 0x0001 = 1; 0x8000 = -32768 (sign extension); 0xFFFF = -1
    val samples = ContainerHeaders
      .pcmSamples(wavWith(16, Seq(0x01, 0x00, 0x00, 0x80, 0xff, 0xff)))
    assert(samples.map(_.toSeq).contains(Seq(1, -32768, -1)))
    // odd-sized data chunk: the trailing byte cannot be half a sample
    assert(ContainerHeaders
      .pcmSamples(wavWith(16, Seq(0x02, 0x00, 0x7f))).map(_.toSeq)
      .contains(Seq(2)))
    // a format the decoder does not claim to read → None, not a misread
    assert(ContainerHeaders.pcmSamples(wavWith(8, Seq(1, 2))).isEmpty)
    assert(ContainerHeaders.pcmSamples("plain text".getBytes).isEmpty)
    // a 16-bit container whose fmt tag is NOT integer PCM (0xFFFE =
    // WAVE_FORMAT_EXTENSIBLE) must be refused, not decoded as raw PCM —
    // bits_per_sample alone does not make it the claimed format
    def wavTagged(tag: Int) =
      (Seq('R', 'I', 'F', 'F').map(_.toInt) ++ le32(40) ++
        Seq('W', 'A', 'V', 'E').map(_.toInt) ++
        Seq('f', 'm', 't', ' ').map(_.toInt) ++ le32(16) ++
        le16(tag) ++ le16(1) ++ le32(8000) ++ le32(16000) ++
        le16(2) ++ le16(16) ++
        Seq('d', 'a', 't', 'a').map(_.toInt) ++ le32(2) ++
        Seq(0x01, 0x00)).map(_.toByte).toArray
    assert(ContainerHeaders.pcmSamples(wavTagged(0xFFFE)).isEmpty)
    assert(ContainerHeaders.pcmSamples(wavTagged(1)).map(_.toSeq)
      .contains(Seq(1)))
    // builder WAVs round-trip: byte j of data = (seed + j*131) & 0xff
    val built = Multimodal.MediaBuilders.wav(8000, 1, 16, 4, seed = 7L)
    val expected = Seq(
      ((7 + 131 * 1) & 0xff) * 256 + ((7 + 131 * 0) & 0xff),
      ((7 + 131 * 3) & 0xff) * 256 + ((7 + 131 * 2) & 0xff))
      .map(v => if (v >= 32768) v - 65536 else v)
    assert(ContainerHeaders.pcmSamples(built).map(_.toSeq)
      .contains(expected))
  }

  test("pngPixels inflates real IDAT data and unfilters scanlines; " +
      "refuses formats it does not claim") {
    import Multimodal.{MediaBuilders, MediaDecoder}
    import MediaDecoder.ContainerHeaders
    // closed-form round trip: pixel byte j = (seed + j*131) & 0xff
    val b = MediaBuilders.pngWithPixels(3, 2, seed = 5L)
    val got = ContainerHeaders.pngPixels(b)
    assert(got.isDefined)
    val (w, h, px) = got.get
    assert((w, h) === (3, 2))
    assert(px.length === 3 * 3 * 2)
    px.zipWithIndex.foreach { case (v, j) =>
      assert((v & 0xff) === ((5 + j * 131) & 0xff), s"pixel byte $j")
    }
    // the header-only builder PNG has no IDAT → None, not garbage
    assert(ContainerHeaders.pngPixels(
      MediaBuilders.png(8, 8, filler = 4, seed = 1L)).isEmpty)
    // rebuild a container around arbitrary IDAT bytes (CRCs unchecked by
    // the decoder, so zeros suffice) over a template's signature + IHDR
    def wrapIdat(tmpl: Array[Byte], idat: Array[Byte]): Array[Byte] = {
      def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
        (v >>> 8).toByte, v.toByte)
      val out = new java.io.ByteArrayOutputStream()
      out.write(tmpl, 0, 33) // signature + IHDR
      out.write(be32(idat.length)); out.write("IDAT".getBytes("US-ASCII"))
      out.write(idat); out.write(be32(0))
      out.write(be32(0)); out.write("IEND".getBytes("US-ASCII"))
      out.write(be32(0))
      out.toByteArray
    }
    // truncated COMPRESSED stream (length field consistent, inflate
    // cannot finish) → None
    val idatLen = ((b(33) & 0xff) << 24) | ((b(34) & 0xff) << 16) |
      ((b(35) & 0xff) << 8) | (b(36) & 0xff)
    val comp = java.util.Arrays.copyOfRange(b, 41, 41 + idatLen)
    assert(ContainerHeaders.pngPixels(
      wrapIdat(b, comp.take(comp.length / 2))).isEmpty)
    // a non-zero filter byte is a format this decoder does not claim
    val subFiltered = {
      val raw = new Array[Byte](2 * (1 + 3 * 1)) // 1×2, all-zero pixels
      raw(0) = 1 // filter type Sub on row 0
      val d = new java.util.zip.Deflater(); d.setInput(raw); d.finish()
      val cbuf = new Array[Byte](raw.length + 64)
      val n = d.deflate(cbuf); d.end()
      wrapIdat(MediaBuilders.pngWithPixels(1, 2, seed = 0L), cbuf.take(n))
    }
    assert(ContainerHeaders.pngPixels(subFiltered).isEmpty)
    assert(ContainerHeaders.pngPixels("not a png".getBytes).isEmpty)
  }

  test("jpegBaseline round-trips through the real baseline decoder: " +
      "flat DC-only blocks at dc+128, exact") {
    import Multimodal.{MediaBuilders, MediaDecoder}
    val dcs = Array(5, -20, 99, -100)
    val payload = MediaBuilders.jpegBaseline(16, 16, dcs)
    val (w, h, px) = MediaDecoder.ContainerHeaders.jpegPixels(payload)
      .getOrElse(fail("decoder refused its own builder's baseline JPEG"))
    assert((w, h) === (16, 16))
    // row-major blocks: each 8x8 block flat at dc+128
    def at(x: Int, y: Int): Int = px(y * 16 + x) & 0xff
    assert(at(0, 0) === 133 && at(7, 7) === 133)
    assert(at(8, 0) === 108 && at(15, 7) === 108)
    assert(at(0, 8) === 227 && at(7, 15) === 227)
    assert(at(8, 8) === 28 && at(15, 15) === 28)
    // header dims parse agrees with the full decode
    assert(MediaDecoder.ContainerHeaders.dimensions(payload)
      .contains((16, 16)))
    // DC prediction is differential: a long run of varying DCs survives
    val many = Array.tabulate(20)(k => ((k * 37) % 200) - 100)
    val (w2, _, px2) = MediaDecoder.ContainerHeaders
      .jpegPixels(MediaBuilders.jpegBaseline(40, 32, many))
      .getOrElse(fail("20-block JPEG must decode"))
    for (k <- many.indices) {
      val (bxv, byv) = (k % (w2 / 8), k / (w2 / 8))
      assert((px2(byv * 8 * w2 + bxv * 8) & 0xff) === many(k) + 128,
        s"block $k")
    }
  }

  test("jpegPixels resyncs at restart markers and resets the DC predictor") {
    import Multimodal.{MediaBuilders, MediaDecoder}
    val dcs = Array(10, 20, 30, 40, 50, 60)
    val payload = MediaBuilders.jpegBaseline(48, 8, dcs, restartEvery = 2)
    val (w, _, px) = MediaDecoder.ContainerHeaders.jpegPixels(payload)
      .getOrElse(fail("restart-marker JPEG must decode"))
    for (k <- dcs.indices)
      assert((px(k * 8) & 0xff) === dcs(k) + 128, s"block $k")
    assert(w === 48)
  }

  test("jpegPixels agrees with an independent decoder (ImageIO) on a " +
      "real AC-coefficient gradient within JPEG's IDCT conformance budget") {
    import Multimodal.MediaDecoder
    // a gradient exercises everything the flat-block corpus does not:
    // nonzero AC coefficients, zigzag placement, run-length skips
    val img = new java.awt.image.BufferedImage(40, 24,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 24; x <- 0 until 40)
      img.getRaster.setSample(x, y, 0, (x * 5 + y * 3 + (x * y) % 7) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val payload = bos.toByteArray
    val (w, h, px) = MediaDecoder.ContainerHeaders.jpegPixels(payload)
      .getOrElse(fail("ImageIO's grayscale baseline JPEG must decode"))
    assert((w, h) === (40, 24))
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs((px(y * w + x) & 0xff) - ref.getRaster.getSample(x, y, 0))
      if (d > maxDiff) maxDiff = d
    }
    // T.81 Annex A conformance allows small per-sample divergence between
    // compliant IDCTs; ImageIO's fast kernel vs this definition-exact one
    assert(maxDiff <= 2, s"max per-pixel divergence $maxDiff > 2")
  }

  test("jpegBaselineColor round-trips: flat YCbCr blocks convert to the " +
      "exact integer fixed-point RGB") {
    import Multimodal.{MediaBuilders, MediaDecoder}
    val payload = MediaBuilders.jpegBaselineColor(16, 8,
      yDcs = Array(20, -30), cbDcs = Array(40, -25), crDcs = Array(-50, 35))
    val (w, h, px) = MediaDecoder.ContainerHeaders.jpegRgbPixels(payload)
      .getOrElse(fail("own color JPEG must decode"))
    assert((w, h) === (16, 8))
    // replay the decoder's documented integer formula independently
    def rgb(y0: Int, cb0: Int, cr0: Int): (Int, Int, Int) = {
      val (y, cb, cr) = (y0 + 128, cb0, cr0)
      def cl(v: Int) = math.max(0, math.min(255, v))
      (cl(y + ((91881 * cr + 32768) >> 16)),
        cl(y - ((22554 * cb + 46802 * cr + 32768) >> 16)),
        cl(y + ((116130 * cb + 32768) >> 16)))
    }
    val b0 = rgb(20, 40, -50)
    val b1 = rgb(-30, -25, 35)
    def at(x: Int, y: Int) = (px(3 * (y * 16 + x)) & 0xff,
      px(3 * (y * 16 + x) + 1) & 0xff, px(3 * (y * 16 + x) + 2) & 0xff)
    assert(at(0, 0) === b0 && at(7, 7) === b0)
    assert(at(8, 0) === b1 && at(15, 7) === b1)
    // claims discipline both ways: gray is not RGB's format and vice versa
    assert(MediaDecoder.ContainerHeaders.jpegRgbPixels(
      MediaBuilders.jpegBaseline(16, 16, Array(1, 2, 3, 4))).isEmpty)
    assert(MediaDecoder.ContainerHeaders.jpegPixels(payload).isEmpty)
  }

  test("jpegRgbPixels agrees with ImageIO on a real 4:2:0 color JPEG " +
      "(subsampled chroma, AC coefficients) within the upsampling budget") {
    import Multimodal.MediaDecoder
    // smooth gradients keep chroma slow-varying, so nearest-neighbor vs
    // ImageIO's fancier chroma upsampling stays within a small budget
    val img = new java.awt.image.BufferedImage(48, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 48)
      img.setRGB(x, y, ((x * 4 + 40) << 16) | ((y * 5 + 30) << 8) |
        (200 - x * 2))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val payload = bos.toByteArray
    val (w, h, px) = MediaDecoder.ContainerHeaders.jpegRgbPixels(payload)
      .getOrElse(fail("ImageIO's 4:2:0 color baseline JPEG must decode"))
    assert((w, h) === (48, 32))
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    var maxDiff = 0
    var sumDiff = 0L
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val refV = (ref.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      val d = math.abs((px(3 * (y * w + x) + c) & 0xff) - refV)
      sumDiff += d
      if (d > maxDiff) maxDiff = d
    }
    val meanDiff = sumDiff.toDouble / (3 * w * h)
    assert(meanDiff <= 2.0, s"mean per-sample divergence $meanDiff > 2")
    assert(maxDiff <= 16, s"max per-sample divergence $maxDiff > 16")
  }

  test("jpegPixels refuses what it does not claim: color, truncation, " +
      "header-only containers") {
    import Multimodal.{MediaBuilders, MediaDecoder}
    // a 3-component color JPEG is not this decoder's format
    val rgb = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "jpg", bos)
    assert(MediaDecoder.ContainerHeaders.jpegPixels(bos.toByteArray).isEmpty)
    // truncated entropy stream → None, not garbage
    val ok = MediaBuilders.jpegBaseline(16, 16, Array(5, -20, 99, -100))
    assert(MediaDecoder.ContainerHeaders.jpegPixels(ok.take(ok.length - 8))
      .isEmpty)
    // the q79 header-only builder has no scan at all
    assert(MediaDecoder.ContainerHeaders
      .jpegPixels(MediaBuilders.jpeg(100, 50, 4, 7L)).isEmpty)
    assert(MediaDecoder.ContainerHeaders.jpegPixels("noise".getBytes).isEmpty)
  }

  test("jpegProgressive round-trips through the real Annex G decoder: " +
      "DC point-transform + refinement bit reconstructs every dc exactly") {
    import Multimodal.{MediaBuilders, MediaDecoder}
    // odd AND even, positive AND negative DCs: the Al=1 first scan sends
    // dc >> 1 (arithmetic), the refinement scan ORs bit 0 back in — any
    // sign/parity mistake in either direction shifts a block by 1
    val dcs = Array(5, -20, 99, -101, 0, -1, 64, 63)
    val payload = MediaBuilders.jpegProgressive(32, 16, dcs)
    val (w, h, px) = MediaDecoder.ContainerHeaders.jpegPixels(payload)
      .getOrElse(fail("decoder refused its own progressive JPEG"))
    assert((w, h) === (32, 16))
    for (k <- dcs.indices) {
      val (bxv, byv) = (k % 4, k / 4)
      assert((px(byv * 8 * w + bxv * 8) & 0xff) === dcs(k) + 128,
        s"block $k")
    }
    // the SOF2 dims surface through the header parser too
    assert(MediaDecoder.ContainerHeaders.dimensions(payload)
      .contains((32, 16)))
  }

  test("jpegProgressive resyncs at restart markers in every scan kind " +
      "(DC-first predictor reset, AC EOB-run reset, DC-refinement)") {
    import Multimodal.{MediaBuilders, MediaDecoder}
    val dcs = Array(10, -21, 30, -41, 50, -61, 7, 8, -9)
    val payload = MediaBuilders.jpegProgressive(72, 8, dcs, restartEvery = 2)
    val (w, _, px) = MediaDecoder.ContainerHeaders.jpegPixels(payload)
      .getOrElse(fail("restart-marker progressive JPEG must decode"))
    for (k <- dcs.indices)
      assert((px(k * 8) & 0xff) === dcs(k) + 128, s"block $k")
    assert(w === 72)
  }

  test("jpegProgressiveColor round-trips: interleaved DC scans + " +
      "per-component AC scans reconstruct the exact integer RGB") {
    import Multimodal.{MediaBuilders, MediaDecoder}
    val payload = MediaBuilders.jpegProgressiveColor(16, 8,
      yDcs = Array(21, -30), cbDcs = Array(41, -25), crDcs = Array(-51, 35))
    val (w, h, px) = MediaDecoder.ContainerHeaders.jpegRgbPixels(payload)
      .getOrElse(fail("own progressive color JPEG must decode"))
    assert((w, h) === (16, 8))
    def rgb(y0: Int, cb0: Int, cr0: Int): (Int, Int, Int) = {
      val (y, cb, cr) = (y0 + 128, cb0, cr0)
      def cl(v: Int) = math.max(0, math.min(255, v))
      (cl(y + ((91881 * cr + 32768) >> 16)),
        cl(y - ((22554 * cb + 46802 * cr + 32768) >> 16)),
        cl(y + ((116130 * cb + 32768) >> 16)))
    }
    def at(x: Int, y: Int) = (px(3 * (y * 16 + x)) & 0xff,
      px(3 * (y * 16 + x) + 1) & 0xff, px(3 * (y * 16 + x) + 2) & 0xff)
    assert(at(0, 0) === rgb(21, 41, -51) && at(7, 7) === rgb(21, 41, -51))
    assert(at(8, 0) === rgb(-30, -25, 35) && at(15, 7) === rgb(-30, -25, 35))
    // claims discipline: color progressive is not jpegPixels' format
    assert(MediaDecoder.ContainerHeaders.jpegPixels(payload).isEmpty)
    assert(MediaDecoder.ContainerHeaders.jpegRgbPixels(
      MediaBuilders.jpegProgressive(16, 16, Array(1, 2, 3, 4))).isEmpty)
  }

  test("progressive decode agrees with an independent decoder on a REAL " +
      "nonzero-AC progressive stream (spectral bands, AC refinement over " +
      "nonzero history) within the IDCT conformance budget") {
    import Multimodal.MediaDecoder
    // ImageIO's progressive writer emits a real multi-scan script with
    // AC successive approximation — the refinement-over-nonzero-history
    // path the closed-form fixtures cannot exercise by design
    val img = new java.awt.image.BufferedImage(40, 24,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 24; x <- 0 until 40)
      img.getRaster.setSample(x, y, 0, (x * 5 + y * 3 + (x * y) % 7) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose()
    val payload = bos.toByteArray
    // it IS progressive (SOF2 present), or this test proves nothing
    assert(payload.sliding(2).exists(s =>
      (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xc2),
      "ImageIO must have written an SOF2 progressive stream")
    val (w, h, px) = MediaDecoder.ContainerHeaders.jpegPixels(payload)
      .getOrElse(fail("real progressive grayscale JPEG must decode"))
    assert((w, h) === (40, 24))
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs((px(y * w + x) & 0xff) - ref.getRaster.getSample(x, y, 0))
      if (d > maxDiff) maxDiff = d
    }
    assert(maxDiff <= 2, s"max per-pixel divergence $maxDiff > 2")
  }

  test("progressive color decode agrees with an independent decoder on a " +
      "real subsampled progressive JPEG within the upsampling budget") {
    import Multimodal.MediaDecoder
    val img = new java.awt.image.BufferedImage(48, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 48)
      img.setRGB(x, y, ((x * 4 + 40) << 16) | ((y * 5 + 30) << 8) |
        (200 - x * 2))
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose()
    val payload = bos.toByteArray
    assert(payload.sliding(2).exists(s =>
      (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xc2))
    val (w, h, px) = MediaDecoder.ContainerHeaders.jpegRgbPixels(payload)
      .getOrElse(fail("real progressive color JPEG must decode"))
    assert((w, h) === (48, 32))
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    var maxDiff = 0
    var sumDiff = 0L
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val refV = (ref.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      val d = math.abs((px(3 * (y * w + x) + c) & 0xff) - refV)
      sumDiff += d
      if (d > maxDiff) maxDiff = d
    }
    val meanDiff = sumDiff.toDouble / (3 * w * h)
    assert(meanDiff <= 2.0, s"mean per-sample divergence $meanDiff > 2")
    assert(maxDiff <= 16, s"max per-sample divergence $maxDiff > 16")
  }

  test("progressive decode refuses what it does not claim: truncation, " +
      "malformed scan headers") {
    import Multimodal.{MediaBuilders, MediaDecoder}
    val ok = MediaBuilders.jpegProgressive(16, 16, Array(5, -20, 99, -100))
    // truncated mid-scan → None, not garbage
    assert(MediaDecoder.ContainerHeaders.jpegPixels(ok.take(ok.length - 8))
      .isEmpty)
    // corrupt a scan header: find the FIRST SOS and make the DC band
    // illegal (Ss=0, Se=5 — spectral selection must not mix DC and AC)
    val bad = ok.clone()
    val sos = bad.sliding(2).indexWhere(s =>
      (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xda)
    bad(sos + 8) = 5 // Se byte of the ns=1 scan header (FF DA len2 ns cid tt Ss Se)
    assert(MediaDecoder.ContainerHeaders.jpegPixels(bad).isEmpty)
  }

  test("blockMeanHash64: all-integer block-mean bits (strict >), grid " +
      "geometry, and the closed form through a real JPEG decode") {
    import Multimodal.{blockMeanHash64, MediaBuilders, MediaDecoder}
    // 8x8 image, 1px cells: values 0..63, total 2016 — bit k set iff
    // 64*v(k) > 2016 iff v(k) >= 32 (strict integer compare, no floats)
    val px = Array.tabulate(64)(_.toByte)
    assert(blockMeanHash64(px, 8, 8) === 0xFFFFFFFF00000000L)
    // constant image: 64*cell == total everywhere, strict > → all zero
    assert(blockMeanHash64(Array.fill(64)(7.toByte), 8, 8) === 0L)
    // 16x16 (2x2 cells): brightening ONE cell past the mean flips
    // exactly that bit
    val flat = Array.fill(256)(100.toByte)
    val one = flat.clone()
    for (y <- 0 until 2; x <- 0 until 2) one(y * 16 + x) = 120.toByte
    val h1 = blockMeanHash64(one, 16, 16)
    assert(java.lang.Long.bitCount(h1 ^ blockMeanHash64(flat, 16, 16)) === 1)
    assert((h1 & 1L) === 1L, "cell (0,0) is bit 0")
    intercept[IllegalArgumentException](blockMeanHash64(px, 12, 12))
    // the q104 closed form: hashing DECODED flat-block pixels equals
    // the pure-DC arithmetic (level shift cancels in the comparison)
    val dcs = Array.tabulate(64)(k => ((k * 37) % 200) - 100)
    val (w, h, dec) = MediaDecoder.ContainerHeaders
      .jpegPixels(MediaBuilders.jpegBaseline(64, 64, dcs))
      .getOrElse(fail("q104 corpus JPEG must decode"))
    val total = dcs.map(_.toLong).sum
    val expect = (0 until 64).foldLeft(0L)((acc, k) =>
      if (64L * dcs(k) > total) acc | (1L << k) else acc)
    assert(blockMeanHash64(dec, w, h) === expect)
  }

  test("extractFeatures surfaces decoded dims through the pluggable seam") {
    import spark.implicits._
    val png = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0x00, 0x00, 0x00, 0x0d, 'I', 'H', 'D', 'R',
      0x00, 0x00, 0x00, 0x40, 0x00, 0x00, 0x00, 0x20, 0x08).map(_.toByte)
    val ds = Seq(
      Multimodal.MediaRow(1L, png, Multimodal.MediaMeta("image", 0, 0, 0, 0L)),
      Multimodal.MediaRow(2L, "not an image".getBytes,
        Multimodal.MediaMeta("audio", 0, 0, 16000, 0L))).toDS()
    val feats = Multimodal.extractFeatures(ds).collect().sortBy(_.media_id)
    assert(feats(0).width.contains(64) && feats(0).height.contains(32))
    assert(feats(1).width.isEmpty && feats(1).height.isEmpty)
    // the Fake double rides the same seam
    val fake = Multimodal.extractFeatures(ds, Multimodal.MediaDecoder.Fake)
      .collect().sortBy(_.media_id)
    assert(fake(0).width.contains(png.length % 512))
  }

  test("frame sampling yields n frames per payload") {
    val frames = Multimodal.sampleFrames(media.toDF(), n = 4, frameBytes = 8)
    val counts = frames.groupBy("media_id").count().collect()
    assert(counts.forall(_.getLong(1) == 4))
    assert(frames.schema("frame_bytes").dataType.typeName == "binary")
  }

  test("resize stub bounds payload size") {
    val resized = media.toDF().select(
      length(Multimodal.resizeStub(col("payload"), 16)).as("n")).collect()
    assert(resized.forall(_.getInt(0) <= 16))
  }

  test("resizeBox: hand-computed floor-means on NON-constant cells (the " +
      "case the q109 oracle cannot reach), channel independence, f=1 " +
      "identity, loud rejects") {
    import Multimodal.resizeBox
    // 4x4 gray, f=2: cell sums 1+2+5+6=14 -> 3 (floor), 3+4+7+8=22 -> 5,
    // 9+10+13+14=46 -> 11, 11+12+15+16=54 -> 13
    val gray = Array.tabulate(16)(i => (i + 1).toByte)
    val (gw, gh, g) = resizeBox(gray, 4, 4, channels = 1, f = 2)
    assert((gw, gh) == (2, 2))
    assert(g.map(_ & 0xff).toSeq == Seq(3, 5, 11, 13))
    // RGB 2x2 -> 1x1: per-channel floor means over interleaved samples,
    // incl. a 255-heavy cell that must not wrap
    val rgb = Array(
      10, 20, 255, 11, 22, 255,
      13, 24, 255, 14, 27, 252).map(_.toByte)
    val (cw, ch, c) = resizeBox(rgb, 2, 2, channels = 3, f = 2)
    assert((cw, ch) == (1, 1))
    assert(c.map(_ & 0xff).toSeq == Seq(12, 23, 254)) // 48/4, 93/4, 1017/4
    // f=1 is the identity on any channel count
    val (iw, ih, i1) = resizeBox(rgb, 2, 2, channels = 3, f = 1)
    assert((iw, ih) == (2, 2) && i1.toSeq == rgb.toSeq)
    intercept[IllegalArgumentException](
      resizeBox(gray, 4, 4, channels = 1, f = 3)) // 3 does not divide 4
    intercept[IllegalArgumentException](
      resizeBox(gray, 4, 4, channels = 3, f = 2)) // length mismatch
  }

  test("MediaBuilders round-trip through ContainerHeaders; byte lengths match " +
    "the closed forms the q79 oracle uses") {
    import Multimodal.{MediaBuilders, MediaDecoder}
    val png = MediaBuilders.png(1215, 913, filler = 62, seed = 7L)
    assert(png.length == 57 + 62) // oracle formula: 57 + filler
    assert(MediaDecoder.ContainerHeaders.dimensions(png).contains((1215, 913)))
    // PNG chunk CRCs are real — javax.imageio-grade readers check them
    val crc = new java.util.zip.CRC32
    crc.update(png, 12, 17) // IHDR type+data
    assert(((png(29) << 24) | ((png(30) & 0xff) << 16) |
      ((png(31) & 0xff) << 8) | (png(32) & 0xff)) == crc.getValue.toInt)
    val jpg = MediaBuilders.jpeg(65535, 1, filler = 0, seed = 1L)
    assert(jpg.length == 21) // oracle formula: 21 + filler
    assert(MediaDecoder.ContainerHeaders.dimensions(jpg).contains((65535, 1)))
    val wav = MediaBuilders.wav(22050, 2, 16, filler = 10, seed = 3L)
    assert(wav.length == 44 + 10) // oracle formula: 44 + filler
    assert(MediaDecoder.ContainerHeaders.audioFormat(wav)
      .contains(Multimodal.AudioFormat(22050, 2, 16)))
    // builders are deterministic in (params, seed)
    assert(png.toSeq == MediaBuilders.png(1215, 913, 62, 7L).toSeq)
    assert(wav.toSeq != MediaBuilders.wav(22050, 2, 16, 10, seed = 4L).toSeq)
  }

  test("syntheticMediaFromDocs: every payload parses back to its closed-form " +
    "params (the q79 contract)") {
    val docs = Tables.read(spark, dir, "documents")
    val rows = Multimodal.extractFeatures(
      Multimodal.syntheticMediaFromDocs(docs)).collect()
    assert(rows.length == docs.count())
    rows.foreach { f =>
      val id = f.media_id
      val filler = (2 * (id % 32)).toInt
      (id % 3).toInt match {
        case 0 =>
          assert(f.kind == "png" && f.n_bytes == 57 + filler)
          assert(f.width.contains((16 + (id * 7) % 1200).toInt))
          assert(f.height.contains((16 + (id * 13) % 900).toInt))
          assert(f.sample_rate.isEmpty && f.channels.isEmpty)
        case 1 =>
          assert(f.kind == "jpeg" && f.n_bytes == 21 + filler)
          assert(f.width.contains((16 + (id * 7) % 1200).toInt))
          assert(f.height.contains((16 + (id * 13) % 900).toInt))
        case _ =>
          assert(f.kind == "wav" && f.n_bytes == 44 + filler)
          assert(f.width.isEmpty && f.height.isEmpty)
          assert(f.channels.contains((1 + id % 2).toInt))
          val sr = (id % 4).toInt match {
            case 0 => 8000; case 1 => 16000; case 2 => 22050; case _ => 44100
          }
          assert(f.sample_rate.contains(sr))
      }
    }
  }

  test("MediaBuilders.mp4 round-trips through mp4Track: both FullBox " +
    "versions, stts run expansion, sync table, sizes, and a chunk offset " +
    "that really lands on the mdat payload") {
    import Multimodal.{MediaBuilders, MediaDecoder, VideoParams => V}
    val dec = MediaDecoder.ContainerHeaders
    // ids 0..7 sweep mvhd v0/v1 × mdhd v0/v1 × all four timescales
    for (id <- 0L to 7L) {
      val b = MediaBuilders.mp4(id)
      val tr = dec.mp4Track(b).getOrElse(fail(s"mp4 $id did not parse"))
      val n = V.nSamples(id)
      assert(tr.timescale == V.timescale(id), s"id=$id")
      assert(tr.width == V.width(id) && tr.height == V.height(id))
      assert(tr.sampleSizes.toSeq ==
        (0 until n).map(i => V.sampleSize(id, i)))
      assert(tr.sampleDeltas.toSeq ==
        Seq.fill(n / 2)(V.delta1(id)) ++ Seq.fill(n - n / 2)(V.delta2(id)))
      assert(tr.syncSamples.toSeq == (1 to n by V.kfInterval(id)).toSeq)
      // the chunk offset must point just past a real mdat header...
      assert(new String(b, tr.chunkOffset.toInt - 4, 4, "ISO-8859-1") == "mdat")
      // ...and the payload there is the fill() closed form the oracle sums
      for (j <- 0 until 5)
        assert(b(tr.chunkOffset.toInt + j) == ((id + j * 131) & 0xff).toByte)
      // deterministic
      assert(b.toSeq == MediaBuilders.mp4(id).toSeq)
    }
  }

  test("mp4Track handles the uniform stsz layout, an absent stss " +
    "(every sample sync, 14496-12 §8.6.2) and a 64-bit largesize header") {
    import Multimodal.MediaDecoder
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    def tag(t: String) = t.getBytes("ISO-8859-1")
    def box(t: String, p: Array[Byte]) = be32(8 + p.length) ++ tag(t) ++ p
    // moov written with the size==1 + 64-bit largesize header
    def largeBox(t: String, p: Array[Byte]) =
      be32(1) ++ tag(t) ++ be32(0) ++ be32(16 + p.length) ++ p
    val full0 = Array[Byte](0, 0, 0, 0)
    val stsd = box("stsd", full0 ++ be32(1) ++ (be32(86) ++ tag("avc1") ++
      Array.fill[Byte](6)(0) ++ be16(1) ++ Array.fill[Byte](16)(0) ++
      be16(320) ++ be16(240) ++ Array.fill[Byte](50)(0)))
    val stts = box("stts", full0 ++ be32(1) ++ be32(3) ++ be32(10))
    val stsz = box("stsz", full0 ++ be32(20) ++ be32(3)) // uniform 20×3
    def assemble(chunkOff: Int): Array[Byte] = {
      val stco = box("stco", full0 ++ be32(1) ++ be32(chunkOff))
      val stbl = box("stbl", stsd ++ stts ++ stsz ++ stco) // no stss
      val mdhd = box("mdhd", full0 ++ be32(0) ++ be32(0) ++ be32(1000) ++
        be32(30) ++ be16(0x55c4) ++ be16(0))
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd ++ minf)
      val trak = box("trak", mdia)
      val moov = largeBox("moov", trak)
      val ftyp = box("ftyp", tag("isom") ++ be32(0) ++ tag("mp42"))
      ftyp ++ moov ++ box("mdat", Array.fill[Byte](60)(7))
    }
    val pre = assemble(0)
    val dataOff = pre.length - 60 // mdat payload position is layout-fixed
    val b = assemble(dataOff)
    val tr = MediaDecoder.ContainerHeaders.mp4Track(b)
      .getOrElse(fail("minimal mp4 did not parse"))
    assert(tr.timescale == 1000 && tr.width == 320 && tr.height == 240)
    assert(tr.sampleSizes.toSeq == Seq(20, 20, 20))
    assert(tr.sampleDeltas.toSeq == Seq(10L, 10L, 10L))
    assert(tr.syncSamples.toSeq == Seq(1, 2, 3)) // absent stss → all sync
    assert(tr.chunkOffset == dataOff)
  }

  test("mp4Track refuses what it does not claim: truncation, corrupt box " +
    "sizes, a missing brand, out-of-range sync samples") {
    import Multimodal.{MediaBuilders, MediaDecoder}
    val dec = MediaDecoder.ContainerHeaders
    val good = MediaBuilders.mp4(5L)
    assert(dec.mp4Track(good).isDefined)
    // truncated mid-moov: the sample tables overrun the remaining bytes
    assert(dec.mp4Track(good.take(good.length / 2)).isEmpty)
    // first box is not ftyp
    assert(dec.mp4Track(good.drop(24)).isEmpty)
    // corrupt: moov's declared size overruns the file
    val bad = good.clone()
    val moovAt = {
      var i = 0
      while (!(bad(i + 4) == 'm' && bad(i + 5) == 'o' && bad(i + 6) == 'o' &&
        bad(i + 7) == 'v')) i += 8 + ((bad(i) & 0xff) << 24 |
        (bad(i + 1) & 0xff) << 16 | (bad(i + 2) & 0xff) << 8 |
        (bad(i + 3) & 0xff)) - 8
      i
    }
    bad(moovAt) = 0x7f; bad(moovAt + 1) = 0
    assert(dec.mp4Track(bad).isEmpty)
    // sync table referencing sample beyond the stsz count
    val bad2 = good.clone()
    // stss entries are 1,1+kf,..; overwrite the first entry with n+1000
    val stssAt = {
      var i = 0
      while (!(bad2(i) == 's' && bad2(i + 1) == 't' && bad2(i + 2) == 's' &&
        bad2(i + 3) == 's')) i += 1
      i + 4 // past the type: version/flags
    }
    bad2(stssAt + 8) = 0x7f // first entry's high byte → sample# huge
    assert(dec.mp4Track(bad2).isEmpty)
  }

  test("syntheticVideosFromDocs: every payload parses and its keyframe " +
    "count matches the closed form") {
    import Multimodal.{MediaDecoder, VideoParams => V}
    val docs = Tables.read(spark, dir, "documents").select("doc_id").limit(40)
    val rows = Multimodal.syntheticVideosFromDocs(docs).collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      assert(r.meta.kind == "mp4")
      val tr = MediaDecoder.ContainerHeaders.mp4Track(r.payload)
        .getOrElse(fail(s"video ${r.media_id} did not parse"))
      val n = V.nSamples(r.media_id)
      assert(tr.sampleSizes.length == n)
      assert(tr.syncSamples.length ==
        (n + V.kfInterval(r.media_id) - 1) / V.kfInterval(r.media_id))
    }
  }

  test("resize stub preserves raw non-UTF8 bytes (no string round-trip)") {
    import spark.implicits._
    val raw = Array[Byte](0xFF.toByte, 0x00, 0xAB.toByte, 0x10, 0xC3.toByte, 0x28)
    val out = Seq(Tuple1(raw)).toDF("payload")
      .select(Multimodal.resizeStub(col("payload"), 3).as("r"))
      .head.getAs[Array[Byte]](0)
    // stride = 6/3 = 2 → bytes at positions 1,3,5 (1-based)
    assert(out.toSeq == Seq(0xFF.toByte, 0xAB.toByte, 0xC3.toByte))
  }
}
