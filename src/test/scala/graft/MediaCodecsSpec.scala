package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{MediaCodecs, MediaFixtures}

/** Animated GIFs from an encoder we didn't write: the JDK's own GIF
  * writer sequence API. Uniform-gray frames keep the palette exact, so
  * decoded pixels round-trip the shade values.
  */
object MediaTestGifs {
  def animatedGif(side: Int, shades: Int*): Array[Byte] = {
    import java.awt.image.BufferedImage
    import javax.imageio.{IIOImage, ImageIO}
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    shades.foreach { v =>
      val img = new BufferedImage(side, side, BufferedImage.TYPE_INT_RGB)
      (0 until side).foreach(y => (0 until side).foreach(x =>
        img.setRGB(x, y, (v << 16) | (v << 8) | v)))
      writer.writeToSequence(new IIOImage(img, null, null),
        writer.getDefaultWriteParam)
    }
    writer.endWriteSequence()
    ios.close(); writer.dispose()
    bos.toByteArray
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

  test("pure-channel uniform images pin the per-mille luminance weights") {
    // uniform gray is weight-blind (any weights summing to 1000 map
    // (v,v,v) to v); pure R/G/B payloads pin 299/587/114 individually —
    // same arithmetic the media_histogram oracle recomputes in SQL
    val cases = Seq(
      ((200, 0, 0), 299 * 200 / 1000 / 4), // red   → lum 59 → bin 14
      ((0, 200, 0), 587 * 200 / 1000 / 4), // green → lum 117 → bin 29
      ((0, 0, 200), 114 * 200 / 1000 / 4), // blue  → lum 22 → bin 5
    )
    cases.foreach { case (rgb, bin) =>
      Seq(png(2, 2, Seq.fill(4)(rgb): _*), bmp(2, 2, Seq.fill(4)(rgb): _*))
        .foreach { payload =>
          val h = MediaCodecs.imageHistogram(
            MediaCodecs.decodeImage(payload).get, 64)
          assert(h(bin) == 1.0f, s"rgb=$rgb expected delta at bin $bin")
          assert(h.count(_ != 0f) == 1)
        }
    }
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

  test("WAV 8-bit unsigned decodes with the 128-centered normalization") {
    // 8-bit WAV stores unsigned bytes: 128 → 0.0, 0 → −1.0, 255 → ~+0.992
    val a = MediaCodecs.decodeWav(wav8(8000, 128, 0, 255, 192)).get
    assert(a.sampleRate == 8000)
    assert(a.samples.length == 4)
    assert(a.samples(0) == 0f)
    assert(a.samples(1) == -1f)
    assert(math.abs(a.samples(2) - 127f / 128f) < 1e-6)
    assert(math.abs(a.samples(3) - 0.5f) < 1e-6)
  }

  test("WAV stereo interleaves channels; duration counts frames, not samples") {
    val a = MediaCodecs.decodeWav(wavStereo(8000,
      Seq.fill(800)((1000.toShort, -1000.toShort)): _*)).get
    assert(a.sampleRate == 8000)
    assert(a.samples.length == 1600) // L/R interleaved
    assert(a.durationMs == 100) // 800 frames / 8000 Hz, not 1600/8000
    assert(math.abs(a.samples(0) - 1000f / 32768f) < 1e-6)
    assert(math.abs(a.samples(1) + 1000f / 32768f) < 1e-6)
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

  test("splitFrames survives a JPEG signature planted inside PNG IDAT data") {
    // stored (level-0) IDAT: pixels (255,216,255) put FF D8 FF literally
    // into the first frame's compressed body — a signature-to-signature
    // scanner splits here and loses both frames
    val trap = pngStored(2, 2,
      (255, 216, 255), (255, 216, 255), (255, 216, 255), (255, 216, 255))
    assert(trap.sliding(3).exists(w =>
      (w(0) & 0xff) == 0xff && (w(1) & 0xff) == 0xd8 && (w(2) & 0xff) == 0xff),
      "fixture must contain the JPEG magic inside the PNG")
    val f2 = grayPng(2, 2, 9)
    val segs = MediaCodecs.splitFrames(trap ++ f2)
    assert(segs.length == 2)
    assert(segs(0) == ((0, trap.length)))
    assert(segs(1) == ((trap.length, trap.length + f2.length)))
    // both frames decode — the old scanner degraded both to byte slices
    val payload = trap ++ f2
    segs.foreach { case (s, e) =>
      assert(MediaCodecs.decodeImage(
        java.util.Arrays.copyOfRange(payload, s, e)).isDefined)
    }
  }

  test("splitFrames splits concatenated real JPEGs at their EOI markers") {
    // JPEGs from an encoder we didn't write (ImageIO's JPEG plugin)
    def jpeg(shade: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 4).foreach(y => (0 until 4).foreach(x =>
        img.setRGB(x, y, (shade << 16) | (shade << 8) | shade)))
      val bos = new java.io.ByteArrayOutputStream
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val (j1, j2) = (jpeg(30), jpeg(220))
    val segs = MediaCodecs.splitFrames(j1 ++ j2)
    assert(segs.length == 2)
    assert(segs(0) == ((0, j1.length)))
    assert(segs(1) == ((j1.length, j1.length + j2.length)))
    segs.foreach { case (s, e) =>
      assert(MediaCodecs.decodeImage(
        java.util.Arrays.copyOfRange(j1 ++ j2, s, e)).isDefined)
    }
  }

  test("splitFrames skips an APP1 thumbnail's embedded EOI structurally") {
    // a camera JPEG carries an EXIF/JFIF thumbnail in APP1 — a complete
    // JPEG with its own EOI. A first-FFD9 scan ends the outer frame at
    // the thumbnail's EOI and rescans the remaining entropy data.
    def jpeg(shade: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 4).foreach(y => (0 until 4).foreach(x =>
        img.setRGB(x, y, (shade << 16) | (shade << 8) | shade)))
      val bos = new java.io.ByteArrayOutputStream
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val thumb = jpeg(128)
    val len = thumb.length + 2
    val app1 = Array(0xff.toByte, 0xe1.toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ thumb
    val outer = jpeg(40)
    val withThumb = outer.take(2) ++ app1 ++ outer.drop(2)
    assert(withThumb.sliding(2).indexWhere(w =>
      (w(0) & 0xff) == 0xff && (w(1) & 0xff) == 0xd9) < withThumb.length - 2,
      "fixture must embed an early EOI inside APP1")
    val f2 = jpeg(220)
    val segs = MediaCodecs.splitFrames(withThumb ++ f2)
    assert(segs.length == 2)
    assert(segs(0) == ((0, withThumb.length)))
    assert(segs(1) == ((withThumb.length, withThumb.length + f2.length)))
    segs.foreach { case (s, e) =>
      assert(MediaCodecs.decodeImage(
        java.util.Arrays.copyOfRange(withThumb ++ f2, s, e)).isDefined)
    }
  }

  test("splitFrames falls back to the raw EOI scan on a malformed marker stream") {
    // FF 05 is no valid marker and its "length" (0x0001) is < 2, so the
    // structural walk bails; the raw scan still ends at the planted FFD9
    val junk = Array(0xff, 0xd8, 0xff, 0x05, 0x00, 0x01, 0xff, 0xd9).map(_.toByte)
    val segs = MediaCodecs.splitFrames(junk)
    assert(segs == IndexedSeq((0, 8)))
  }

  test("splitFrames is total on fuzzed bytes: in-bounds, ordered, non-overlapping") {
    // corpus payloads are untrusted; the splitter must terminate and
    // stay within bounds on anything — pure noise, planted magics,
    // truncated real frames, and length fields pointing past EOF
    val rnd = new scala.util.Random(1234)
    val realJpeg = {
      val img = new java.awt.image.BufferedImage(3, 3,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val realPng = grayPng(3, 3, 77)
    (0 until 500).foreach { i =>
      val base = Array.fill(rnd.nextInt(300) + 1)(rnd.nextInt(256).toByte)
      val payload = i % 5 match {
        case 0 => base
        case 1 => // planted JPEG SOI + garbage
          Array(0xff, 0xd8, 0xff).map(_.toByte) ++ base
        case 2 => // truncated real JPEG
          realJpeg.take(rnd.nextInt(realJpeg.length))
        case 3 => // truncated real PNG + noise
          realPng.take(rnd.nextInt(realPng.length)) ++ base
        case _ => // real frame sandwiched in noise
          base ++ (if (i % 2 == 0) realJpeg else realPng) ++ base
      }
      val segs = MediaCodecs.splitFrames(payload) // must not throw
      segs.foreach { case (s, e) =>
        assert(s >= 0 && s < e && e <= payload.length, s"iter $i: ($s,$e)")
      }
      segs.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(e1 <= s2, s"iter $i overlap")
        case _ =>
      }
    }
  }

  test("decoders are total under random mutation of real payloads") {
    // decodeImage/decodeWav/gifFrames/splitFrames all take corpus bytes;
    // mutations of valid payloads must yield None/empty, never throw
    val rnd = new scala.util.Random(77)
    val bases = Seq(
      grayPng(4, 3, 120),
      bmp(3, 4, Seq.fill(12)((5, 6, 7)): _*),
      wav(8000, Seq.fill(64)(123.toShort): _*),
      MediaTestGifs.animatedGif(3, 10, 100, 200))
    (0 until 400).foreach { i =>
      val v = bases(i % bases.length).clone()
      if (i % 2 == 0)
        (0 to rnd.nextInt(6)).foreach(_ =>
          v(rnd.nextInt(v.length)) = rnd.nextInt(256).toByte)
      val payload = if (i % 2 == 1) v.take(rnd.nextInt(v.length) + 1) else v
      MediaCodecs.decodeImage(payload)
      MediaCodecs.decodeWav(payload)
      MediaCodecs.gifFrames(payload)
      MediaCodecs.splitFrames(payload)
    }
  }

  test("animated GIF decodes per frame via ImageIO's indexed reads") {
    val gif = MediaTestGifs.animatedGif(4, 10, 100, 200)
    assert(MediaCodecs.detectFormat(gif) == "gif")
    val frames = MediaCodecs.gifFrames(gif)
    assert(frames.length == 3)
    assert(frames.map(f => f.getRGB(0, 0) & 0xff) == Seq(10, 100, 200))
    // non-GIF payloads and caps
    assert(MediaCodecs.gifFrames(grayPng(2, 2, 5)).isEmpty)
    assert(MediaCodecs.gifFrames(gif, maxFrames = 2).length == 2)
  }

  test("grayPixels bounds output size by stride downsampling") {
    val small = MediaCodecs.decodeImage(grayPng(2, 2, 77)).get
    assert(MediaCodecs.grayPixels(small).toSeq == Seq.fill(4)(77.toByte))
    val wide = MediaCodecs.decodeImage(grayPng(130, 1, 5)).get
    assert(MediaCodecs.grayPixels(wide, maxSide = 64).length <= 65)
  }
}
