package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

/** Pure-JDK media decoding for the multimodal column pipeline — the
  * same zero-new-jars approach as `graft.sources.Codecs` (reference
  * analog: `src/document_loader.py:86-167` per-format dispatch).
  *
  * Images (PNG/JPEG/BMP/GIF) decode through `javax.imageio.ImageIO`;
  * WAV audio through `javax.sound.sampled.AudioSystem`. Both ship in
  * every JDK and run headless on executors. Formats the JDK cannot
  * decode (or payloads that merely LOOK like a known format) fall back
  * to the caller's byte-level feature, so a corrupt payload degrades
  * instead of failing the partition — the same drop-not-fail contract
  * as the document codecs.
  *
  * All decode paths are deterministic: fixed luminance weights, fixed
  * stride subsampling, no wall-clock or RNG — required for the oracle
  * contract (same input → same feature, any partitioning).
  */
object MediaCodecs {

  // ImageIO's default disk cache would create temp files per decode on
  // every executor; in-memory streams are both faster and hermetic.
  ImageIO.setUseCache(false)

  /** Container sniff by magic bytes. Returns one of
    * png|jpeg|gif|bmp|wav|unknown. A sniff match is a HINT, not proof —
    * decoders still fall back on failure.
    */
  def detectFormat(bytes: Array[Byte]): String = {
    def b(i: Int): Int = bytes(i) & 0xff
    if (bytes.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "wav"
    else if (bytes.length >= 8 && b(0) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a) "png"
    else if (bytes.length >= 3 && b(0) == 0xff && b(1) == 0xd8 && b(2) == 0xff) "jpeg"
    else if (bytes.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8') "gif"
    else if (bytes.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else "unknown"
  }

  /** Decode an image payload; None on any failure (unknown format,
    * truncated stream, sniff false-positive).
    */
  def decodeImage(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** Decoded PCM audio: samples normalized to [-1, 1]. */
  final case class DecodedAudio(samples: Array[Float], sampleRate: Int,
      durationMs: Long)

  /** Decode a WAV payload via AudioSystem; 8/16-bit PCM, any channel
    * count (channels are interleaved in `samples`). None on failure.
    */
  def decodeWav(bytes: Array[Byte]): Option[DecodedAudio] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        if (bits != 8 && bits != 16) None
        else {
          val raw = in.readAllBytes()
          val n = raw.length / (bits / 8)
          val samples = new Array[Float](n)
          var i = 0
          if (bits == 8) {
            // WAV 8-bit is unsigned
            while (i < n) { samples(i) = ((raw(i) & 0xff) - 128) / 128f; i += 1 }
          } else {
            val le = !fmt.isBigEndian
            while (i < n) {
              val lo = raw(2 * i) & 0xff
              val hi = raw(2 * i + 1) & 0xff
              val s = if (le) (hi << 8) | lo else (lo << 8) | hi
              samples(i) = s.toShort / 32768f
              i += 1
            }
          }
          val frames = n / math.max(1, fmt.getChannels)
          val durMs = (frames * 1000L) / math.max(1, fmt.getSampleRate.toLong)
          Some(DecodedAudio(samples, fmt.getSampleRate.toInt, durMs))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Luminance histogram over decoded pixels, L2-normalized. Integer
    * weights (299/587/114 per mille) keep binning exact across JVMs.
    * Images larger than ~64k pixels are stride-subsampled — feature cost
    * is O(min(pixels, 65536)) regardless of resolution, which is what
    * keeps the batch loop bounded when payloads are 4k video stills.
    */
  def imageHistogram(img: BufferedImage, dim: Int): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    val stride = math.max(1, math.sqrt((w.toLong * h) / 65536.0).ceil.toInt)
    val counts = new Array[Double](dim)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
        counts((lum * dim) >> 8) += 1.0
        x += stride
      }
      y += stride
    }
    l2(counts)
  }

  /** Amplitude histogram over normalized samples, L2-normalized. Bin =
    * floor((s+1)/2 · dim), clamped — s = +1.0 maps into the top bin.
    */
  def audioHistogram(samples: Array[Float], dim: Int): Array[Float] = {
    val counts = new Array[Double](dim)
    var i = 0
    while (i < samples.length) {
      val bin = math.min(dim - 1, (((samples(i) + 1f) / 2f) * dim).toInt)
      counts(math.max(0, bin)) += 1.0
      i += 1
    }
    l2(counts)
  }

  /** MJPEG-style frame container: a video payload is a byte-concatenated
    * sequence of PNG or JPEG stills. Returns [start, end) segments, one
    * per frame found; empty when the payload is no such container.
    *
    * Structure-aware, not signature-to-signature: a PNG frame ends
    * after its IEND chunk (walking the length-prefixed chunk list) and
    * a JPEG frame at its EOI marker — so signature lookalikes INSIDE a
    * frame's compressed body (PNG bodies are not FF-stuffed, so
    * `FF D8 FF` can occur in IDAT zlib data) never split a valid
    * frame. A truncated/malformed frame falls back to extending to the
    * next signature (or EOF), preserving drop-not-fail downstream.
    */
  def splitFrames(bytes: Array[Byte]): IndexedSeq[(Int, Int)] = {
    def b(i: Int): Int = bytes(i) & 0xff
    def isPngAt(i: Int): Boolean = i + 8 <= bytes.length && b(i) == 0x89 &&
      b(i + 1) == 'P' && b(i + 2) == 'N' && b(i + 3) == 'G'
    def isJpegAt(i: Int): Boolean = i + 3 <= bytes.length && b(i) == 0xff &&
      b(i + 1) == 0xd8 && b(i + 2) == 0xff
    def nextSig(from: Int): Int = {
      var i = from
      while (i < bytes.length && !isPngAt(i) && !isJpegAt(i)) i += 1
      i
    }
    // end of the PNG starting at `start`: after the IEND chunk's CRC
    def pngEnd(start: Int): Option[Int] = {
      var p = start + 8
      while (p + 8 <= bytes.length) {
        val len = (b(p) << 24) | (b(p + 1) << 16) | (b(p + 2) << 8) | b(p + 3)
        if (len < 0 || p + 12L + len > bytes.length) return None
        val isEnd = b(p + 4) == 'I' && b(p + 5) == 'E' && b(p + 6) == 'N' &&
          b(p + 7) == 'D'
        p += 12 + len
        if (isEnd) return Some(p)
      }
      None
    }
    // end of the JPEG starting at `start`: walk marker segments
    // structurally (skip APPn/DQT/DHT/SOF/COM by their length fields,
    // raw-scan only the entropy-coded data after SOS for the next
    // unstuffed marker). An APP1 EXIF payload embedding a thumbnail —
    // which carries its own EOI — is skipped wholesale by its segment
    // length, so a camera JPEG's real EOI ends the frame, not the
    // thumbnail's. Falls back to the naive first-FFD9 scan when the
    // marker stream is malformed (still yields a decodable prefix).
    def jpegEndStructural(start: Int): Option[Int] = {
      var p = start + 2 // past SOI
      while (p + 1 < bytes.length) {
        if (b(p) != 0xff) return None // not at a marker: malformed
        val m = b(p + 1)
        if (m == 0xff) p += 1 // fill byte before a marker
        else if (m == 0xd9) return Some(p + 2) // EOI
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) p += 2 // standalone
        else if (m == 0xda) { // SOS: header, then entropy-coded data
          if (p + 3 >= bytes.length) return None
          val len = (b(p + 2) << 8) | b(p + 3)
          if (len < 2) return None
          p += 2 + len
          // entropy data stuffs FF as FF00 and may hold RSTn; the next
          // FF xx with any other xx is a genuine marker (EOI, DNL, or
          // a progressive scan's next SOS) — resume the walk there
          var found = false
          while (p + 1 < bytes.length && !found) {
            if (b(p) == 0xff) {
              val n2 = b(p + 1)
              if (n2 == 0x00 || (n2 >= 0xd0 && n2 <= 0xd7)) p += 2
              else found = true
            } else p += 1
          }
          if (!found) return None
        } else { // segment with a 2-byte big-endian length (incl. itself)
          if (p + 3 >= bytes.length) return None
          val len = (b(p + 2) << 8) | b(p + 3)
          if (len < 2 || p + 2L + len > bytes.length) return None
          p += 2 + len
        }
      }
      None
    }
    def jpegEnd(start: Int): Option[Int] =
      jpegEndStructural(start).orElse {
        var p = start + 2
        var r: Option[Int] = None
        while (r.isEmpty && p + 1 < bytes.length) {
          if (b(p) == 0xff && b(p + 1) == 0xd9) r = Some(p + 2)
          p += 1
        }
        r
      }
    val segs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0
    while (i < bytes.length - 2) {
      if (isPngAt(i) || isJpegAt(i)) {
        val end = (if (isPngAt(i)) pngEnd(i) else jpegEnd(i))
          .getOrElse(math.max(nextSig(i + 3), i + 3)) // malformed: old rule
        segs += ((i, math.min(end, bytes.length)))
        i = math.max(end, i + 3)
      } else i += 1
    }
    segs.toIndexedSeq
  }

  /** Per-frame decode of an animated GIF — the one real multi-frame
    * container the JDK reads natively (ImageReader's indexed-image
    * API). Returns the decoded frames in order, capped at `maxFrames`;
    * empty for non-GIF payloads, single-frame GIFs yield one frame.
    * Frames are raw rasters (a frame may be a patch smaller than the
    * logical screen under GIF disposal) — deterministic either way.
    */
  def gifFrames(bytes: Array[Byte], maxFrames: Int = 32): IndexedSeq[BufferedImage] =
    if (detectFormat(bytes) != "gif") IndexedSeq.empty
    else try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); IndexedSeq.empty }
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val n = math.min(r.getNumImages(true), maxFrames)
          (0 until n).map(r.read)
        } finally { r.dispose(); iis.close() }
      }
    } catch { case _: Exception => IndexedSeq.empty }

  /** Grayscale pixel bytes of a decoded frame, stride-downsampled to at
    * most maxSide×maxSide, row-major — bounded output size per frame no
    * matter the source resolution.
    */
  def grayPixels(img: BufferedImage, maxSide: Int = 64): Array[Byte] = {
    val w = img.getWidth
    val h = img.getHeight
    val stride = math.max(1, math.max(w, h) / maxSide + (if (math.max(w, h) % maxSide == 0) 0 else 1))
    val out = new ByteArrayOutputStreamLite((h / stride + 1) * (w / stride + 1))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
        out.write(lum.toByte)
        x += stride
      }
      y += stride
    }
    out.toByteArray
  }

  private def l2(counts: Array[Double]): Array[Float] = {
    var ss = 0.0
    var i = 0
    while (i < counts.length) { ss += counts(i) * counts(i); i += 1 }
    val n = math.sqrt(ss)
    counts.map(x => if (n == 0) 0f else (x / n).toFloat)
  }

  /** Tiny growable byte sink (avoids java.io stream sync overhead in the
    * per-pixel loop).
    */
  private final class ByteArrayOutputStreamLite(hint: Int) {
    private var buf = new Array[Byte](math.max(16, hint))
    private var len = 0
    def write(b: Byte): Unit = {
      if (len == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
      buf(len) = b; len += 1
    }
    def toByteArray: Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }
}
