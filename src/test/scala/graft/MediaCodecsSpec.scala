package graft

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.MediaCodecs

/** Real-format media fixtures built from the specs the formats are
  * defined by (PNG = chunked zlib-compressed scanlines per RFC 2083;
  * WAV = RIFF header + PCM frames) — the encoder here is ~40 lines of
  * spec, not a codec library, so these verify the JDK decode path
  * against ground truth, not against itself. Same fixture philosophy as
  * `CodecsSpec.minimalPdf`.
  */
object MediaFixtures {

  /** Truecolor (color type 2) PNG, one RGB triple per pixel. Truecolor
    * rather than grayscale so `getRGB` round-trips component values
    * exactly (the AWT gray→sRGB conversion is gamma-corrected, not
    * identity).
    */
  def png(width: Int, height: Int, rgb: (Int, Int, Int)*): Array[Byte] = {
    require(rgb.length == width * height)
    val out = new ByteArrayOutputStream
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
        (v >>> 8).toByte, v.toByte)
      out.write(be32(data.length))
      val typed = typ.getBytes("US-ASCII") ++ data
      out.write(typed)
      val crc = new CRC32
      crc.update(typed)
      out.write(be32(crc.getValue.toInt))
    }
    chunk("IHDR", Array((width >>> 24).toByte, (width >>> 16).toByte,
      (width >>> 8).toByte, width.toByte, (height >>> 24).toByte,
      (height >>> 16).toByte, (height >>> 8).toByte, height.toByte,
      8.toByte, 2.toByte, 0.toByte, 0.toByte, 0.toByte))
    val scanlines = new ByteArrayOutputStream
    (0 until height).foreach { y =>
      scanlines.write(0) // filter: None
      (0 until width).foreach { x =>
        val (r, g, b) = rgb(y * width + x)
        scanlines.write(r); scanlines.write(g); scanlines.write(b)
      }
    }
    val d = new Deflater()
    d.setInput(scanlines.toByteArray); d.finish()
    val zbuf = new ByteArrayOutputStream
    val buf = new Array[Byte](8192)
    while (!d.finished()) zbuf.write(buf, 0, d.deflate(buf))
    d.end()
    chunk("IDAT", zbuf.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Uniform-gray PNG: every pixel (v, v, v), so luminance == v exactly
    * under the integer per-mille weights.
    */
  def grayPng(width: Int, height: Int, v: Int): Array[Byte] =
    png(width, height, Seq.fill(width * height)((v, v, v)): _*)

  /** 24-bpp uncompressed BMP (BITMAPINFOHEADER, bottom-up rows padded
    * to 4 bytes) — a second image container built from its spec.
    */
  def bmp(width: Int, height: Int, rgb: (Int, Int, Int)*): Array[Byte] = {
    require(rgb.length == width * height)
    val rowLen = (width * 3 + 3) / 4 * 4
    val dataLen = rowLen * height
    val out = new ByteArrayOutputStream
    def le32(v: Int): Unit =
      out.write(Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte))
    def le16(v: Int): Unit = out.write(Array(v.toByte, (v >>> 8).toByte))
    out.write('B'); out.write('M')
    le32(54 + dataLen); le32(0); le32(54)
    le32(40); le32(width); le32(height); le16(1); le16(24)
    le32(0); le32(dataLen); le32(2835); le32(2835); le32(0); le32(0)
    ((height - 1) to 0 by -1).foreach { y => // bottom-up
      (0 until width).foreach { x =>
        val (r, g, b) = rgb(y * width + x)
        out.write(b); out.write(g); out.write(r)
      }
      (width * 3 until rowLen).foreach(_ => out.write(0))
    }
    out.toByteArray
  }

  /** Mono 16-bit little-endian PCM WAV. */
  def wav(sampleRate: Int, samples: Short*): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new ByteArrayOutputStream
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit =
      out.write(Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte))
    def le16(v: Int): Unit = out.write(Array(v.toByte, (v >>> 8).toByte))
    ascii("RIFF"); le32(36 + dataLen); ascii("WAVE")
    ascii("fmt "); le32(16); le16(1); le16(1); le32(sampleRate)
    le32(sampleRate * 2); le16(2); le16(16)
    ascii("data"); le32(dataLen)
    samples.foreach(s => le16(s & 0xffff))
    out.toByteArray
  }
}

class MediaCodecsSpec extends AnyFunSuite {
  import MediaFixtures._

  test("format sniff: png/jpeg/gif/bmp/wav magics, unknown otherwise") {
    assert(MediaCodecs.detectFormat(grayPng(1, 1, 7)) == "png")
    assert(MediaCodecs.detectFormat(wav(8000, 0)) == "wav")
    assert(MediaCodecs.detectFormat(Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte)) == "jpeg")
    assert(MediaCodecs.detectFormat("GIF89a".getBytes) == "gif")
    assert(MediaCodecs.detectFormat("BMxxxx".getBytes) == "bmp")
    assert(MediaCodecs.detectFormat("plain text".getBytes) == "unknown")
    assert(MediaCodecs.detectFormat(Array.emptyByteArray) == "unknown")
  }

  test("PNG decodes via ImageIO with exact pixel round-trip") {
    val img = MediaCodecs.decodeImage(
      png(2, 2, (0, 0, 0), (64, 64, 64), (128, 128, 128), (255, 255, 255))).get
    assert(img.getWidth == 2 && img.getHeight == 2)
    assert((img.getRGB(1, 0) & 0xffffff) == 0x404040)
    assert((img.getRGB(1, 1) & 0xffffff) == 0xffffff)
  }

  test("image luminance histogram matches hand-computed bins") {
    // gray values 0, 64, 128, 255 → lum = v → bin = (v·64)>>8 = 0,16,32,63
    val img = MediaCodecs.decodeImage(
      png(2, 2, (0, 0, 0), (64, 64, 64), (128, 128, 128), (255, 255, 255))).get
    val h = MediaCodecs.imageHistogram(img, 64)
    assert(h.length == 64)
    val expected = Array(0, 16, 32, 63)
    expected.foreach(b => assert(math.abs(h(b) - 0.5f) < 1e-6, s"bin $b"))
    assert(h.zipWithIndex.filterNot(p => expected.contains(p._2)).forall(_._1 == 0f))
  }

  test("BMP decodes via ImageIO with exact pixel round-trip") {
    val img = MediaCodecs.decodeImage(
      bmp(2, 2, (255, 0, 0), (0, 255, 0), (0, 0, 255), (128, 128, 128))).get
    assert(img.getWidth == 2 && img.getHeight == 2)
    assert((img.getRGB(0, 0) & 0xffffff) == 0xff0000)
    assert((img.getRGB(1, 0) & 0xffffff) == 0x00ff00)
    assert((img.getRGB(0, 1) & 0xffffff) == 0x0000ff)
    assert((img.getRGB(1, 1) & 0xffffff) == 0x808080)
  }

  test("decoded features are container-independent: same pixels, same histogram") {
    // the SAME image encoded as PNG and BMP must produce the SAME
    // luminance feature — that is what makes the feature a content
    // signal rather than a byte-level artifact (a byte histogram of the
    // two encodings differs wildly)
    val px = Seq((10, 10, 10), (10, 10, 10), (200, 200, 200), (200, 200, 200))
    val viaPng = MediaCodecs.imageHistogram(
      MediaCodecs.decodeImage(png(2, 2, px: _*)).get, 64)
    val viaBmp = MediaCodecs.imageHistogram(
      MediaCodecs.decodeImage(bmp(2, 2, px: _*)).get, 64)
    assert(viaPng.toSeq == viaBmp.toSeq)
  }

  test("WAV decodes via AudioSystem: samples, rate, duration") {
    val a = MediaCodecs.decodeWav(wav(8000, Seq.fill(1600)(1000.toShort): _*)).get
    assert(a.sampleRate == 8000)
    assert(a.durationMs == 200) // 1600 frames / 8000 Hz
    assert(a.samples.length == 1600)
    assert(math.abs(a.samples(0) - 1000f / 32768f) < 1e-6)
  }

  test("audio amplitude histogram matches hand-computed bins") {
    // samples 0, +0.5, −0.5, ~max → bins 32, 48, 16, 63 at dim=64
    val a = MediaCodecs.decodeWav(wav(8000, 0, 16384, -16384, 32767)).get
    val h = MediaCodecs.audioHistogram(a.samples, 64)
    val expected = Array(32, 48, 16, 63)
    expected.foreach(b => assert(math.abs(h(b) - 0.5f) < 1e-6, s"bin $b"))
    assert(h.zipWithIndex.filterNot(p => expected.contains(p._2)).forall(_._1 == 0f))
  }

  test("corrupt payloads decode to None, never throw") {
    assert(MediaCodecs.decodeImage("BMnot really a bitmap".getBytes).isEmpty)
    assert(MediaCodecs.decodeImage(grayPng(2, 2, 50).take(20)).isEmpty)
    assert(MediaCodecs.decodeWav("RIFFxxxxWAVEgarbage".getBytes).isEmpty)
    assert(MediaCodecs.decodeWav(Array.emptyByteArray).isEmpty)
  }

  test("splitFrames finds concatenated PNG stills; none in plain bytes") {
    val f1 = grayPng(2, 2, 10)
    val f2 = grayPng(2, 2, 200)
    val segs = MediaCodecs.splitFrames(f1 ++ f2)
    assert(segs.length == 2)
    assert(segs(0) == ((0, f1.length)))
    assert(segs(1) == ((f1.length, f1.length + f2.length)))
    assert(MediaCodecs.splitFrames("no frames here".getBytes).isEmpty)
  }

  test("grayPixels bounds output size by stride downsampling") {
    val small = MediaCodecs.decodeImage(grayPng(2, 2, 77)).get
    assert(MediaCodecs.grayPixels(small).toSeq == Seq.fill(4)(77.toByte))
    val wide = MediaCodecs.decodeImage(grayPng(130, 1, 5)).get
    assert(MediaCodecs.grayPixels(wide, maxSide = 64).length <= 65)
  }
}
